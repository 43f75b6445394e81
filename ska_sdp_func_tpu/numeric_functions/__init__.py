"""Numeric functions (reference: src/ska_sdp_func/numeric_functions)."""

from .fft_convolution import fft_convolution

__all__ = ["fft_convolution"]

"""Fourier transform machinery: batched FFT, PSWF windows, SwiFTly."""

from .fft import (
    Fft,
    fft_norm,
    fft_phase,
    fft_shifted,
    ifft_shifted,
    padded_fft_size,
)
from .pswf import Pswf, generate_pswf, pswf_coefficients, pswf_evaluate

__all__ = [
    "Fft",
    "Pswf",
    "fft_norm",
    "fft_phase",
    "fft_shifted",
    "ifft_shifted",
    "generate_pswf",
    "padded_fft_size",
    "pswf_coefficients",
    "pswf_evaluate",
    # lazy (PEP 562) export resolves in __getattr__ below
    "Swiftly",
]


def __getattr__(name):
    if name == "Swiftly":
        from .swiftly import Swiftly

        return Swiftly
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

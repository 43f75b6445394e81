"""FFT-based 2-D convolution, `same`-size output.

Reference: numeric_functions/sdp_fft_convolution.{h,cpp,cu}: pad both
square inputs to the next power of two >= n1 + n2 - 1, FFT, multiply,
inverse FFT (normalised by 1/pad_size), fftshift, crop to in1's size with
the reference's (extra - 1) offset (sdp_remove_padding_2d,
sdp_fft_convolution.cpp:84-107).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..utility.errors import SdpShapeError

Array = jax.Array


def _next_pow2(n: int) -> int:
    while n & (n - 1):
        n += 1
    return n


@partial(jax.jit, static_argnames=("n1", "n2", "pad"))
def _fft_convolve(in1: Array, in2: Array, n1: int, n2: int, pad: int):
    extra1 = (pad - n1) // 2
    extra2 = (pad - n2) // 2
    p1 = jnp.zeros((pad, pad), in1.dtype).at[
        extra1:extra1 + n1, extra1:extra1 + n1].set(in1)
    p2 = jnp.zeros((pad, pad), in2.dtype).at[
        extra2:extra2 + n2, extra2:extra2 + n2].set(in2)
    product = jnp.fft.fft2(p1) * jnp.fft.fft2(p2)
    result = jnp.fft.ifft2(product)  # normalised inverse == C ifft/pad_size
    result = jnp.fft.fftshift(result)
    lo = extra1 - 1
    return jax.lax.dynamic_slice(result, (lo, lo), (n1, n1))


def fft_convolution(in1: Array, in2: Array) -> Array:
    """Convolve two square 2-D arrays; output has in1's shape
    (scipy.signal.convolve 'same' mode semantics, matching
    `sdp_fft_convolution`)."""
    in1 = jnp.asarray(in1)
    in2 = jnp.asarray(in2)
    if in1.ndim != 2 or in1.shape[0] != in1.shape[1]:
        raise SdpShapeError("in1 must be square 2D")
    if in2.ndim != 2 or in2.shape[0] != in2.shape[1]:
        raise SdpShapeError("in2 must be square 2D")
    if not jnp.issubdtype(in1.dtype, jnp.complexfloating):
        in1 = in1.astype(jnp.result_type(in1.dtype, jnp.complex64))
    if in2.dtype != in1.dtype:
        in2 = in2.astype(in1.dtype)
    n1, n2 = int(in1.shape[0]), int(in2.shape[0])
    pad = _next_pow2(n1 + n2 - 1)
    return _fft_convolve(in1, in2, n1, n2, pad)

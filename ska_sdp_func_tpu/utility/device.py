"""Device-transfer helpers.

Some TPU attachments (tunnelled single-chip runtimes) do not support
complex-typed host<->device transfers: device->host readback of a complex
array fails outright, and host->device upload of complex fails after any
prior scalar readback. Work around both by shipping real/imag planes as
float arrays and combining (or splitting) on device.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_combine = jax.jit(jax.lax.complex)


@partial(jax.jit, static_argnames=("shape", "dtype"))
def _zeros_jit(shape, dtype):
    return jnp.zeros(shape, dtype)


def zeros(shape, dtype) -> jax.Array:
    """jnp.zeros through jit: eager complex-producing ops are unsupported
    on some TPU attachments once any scalar readback has happened."""
    if isinstance(shape, int):
        shape = (shape,)
    return _zeros_jit(tuple(shape), jnp.dtype(dtype))


def device_put(x):
    """jnp.asarray that never performs a complex-typed host->device
    transfer: complex input is uploaded as two float planes and combined
    on device."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        fdt = jax.dtypes.canonicalize_dtype(x.real.dtype)
        re = jnp.asarray(np.ascontiguousarray(x.real).astype(fdt))
        im = jnp.asarray(np.ascontiguousarray(x.imag).astype(fdt))
        return _combine(re, im)
    return jnp.asarray(np.ascontiguousarray(
        x.astype(jax.dtypes.canonicalize_dtype(x.dtype))))


def device_get(x) -> np.ndarray:
    """np.asarray that never performs a complex-typed device->host
    transfer: complex arrays are split into real/imag on device and
    recombined on host."""
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.complexfloating):
        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        return re + 1j * im
    return np.asarray(x)


def to_host(x, dtype=None):
    """Device/host array -> host numpy, optionally converting ON HOST.

    Never requests a dtype-converting device->host transfer: on the
    tunnelled attachment `np.asarray(device_f32, np.float64)` HANGS the
    tunnel for minutes (same failure family as complex transfers).
    Transfer in the array's own dtype first, then astype on the host.
    """
    import numpy as _np

    out = _np.asarray(x)
    if dtype is not None and out.dtype != _np.dtype(dtype):
        out = out.astype(dtype)
    return out

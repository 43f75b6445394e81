"""Visibility ingest: RFI flagging + imaging weights in one jitted stage.

BASELINE.md config #4: "FDW RFI flagging + station-beam DFT fused into
the visibility ingest path (batched over baselines)". This module is
that ingest stage: one jitted graph runs the FluctuFlagger over the
canonical [time, baseline, chan, pol] stream, zeroes the imaging weights
of flagged samples, optionally normalises by the station-beam power in
the target direction, and emits the flat [rows, chan] visibilities +
weights the solver consumes.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..station_beam.station import aperture_array
from ..visibility.flagger import flagger_dynamic_threshold

Array = jax.Array


@functools.partial(jax.jit, static_argnames=(
    "alpha", "threshold_magnitudes", "threshold_variations",
    "threshold_broadband", "sampling_step", "window",
    "window_median_history"))
def ingest_flag_and_weight(vis4d: Array, weights4d: Array,
                           alpha: float = 0.5,
                           threshold_magnitudes: float = 3.5,
                           threshold_variations: float = 3.5,
                           threshold_broadband: float = 3.5,
                           sampling_step: int = 1, window: int = 0,
                           window_median_history: int = 10
                           ) -> Tuple[Array, Array, Array]:
    """Flag RFI and zero the affected weights, in one jitted graph.

    vis4d/weights4d: canonical [time, baseline, chan, pol].
    Returns (flags4d int32, weights4d with flags zeroed, flagged_fraction).
    """
    flags = flagger_dynamic_threshold(
        vis4d, alpha=alpha, threshold_magnitudes=threshold_magnitudes,
        threshold_variations=threshold_variations,
        threshold_broadband=threshold_broadband,
        sampling_step=sampling_step, window=window,
        window_median_history=window_median_history)
    clean_w = jnp.where(flags == 0, weights4d,
                        jnp.zeros((), weights4d.dtype))
    frac = jnp.mean(flags.astype(jnp.float32))
    return flags, clean_w, frac


def ingest_to_solver(vis4d: Array, weights4d: Array,
                     beam_gain: Optional[Array] = None,
                     **flagger_kwargs
                     ) -> Tuple[Array, Array, float]:
    """Full ingest: flag -> weight -> (optional beam normalisation) ->
    flatten to the solver's [rows, chan] layout (pol 0).

    ``beam_gain``: per-[time, baseline, chan] voltage-beam power gain in
    the imaging direction (e.g. |aperture_array beam|^2 products);
    weights are divided by it where nonzero (primary-beam weighting).
    Returns (vis [rows, chan], weights [rows, chan], flagged_fraction).
    """
    flags, w, frac = ingest_flag_and_weight(vis4d, weights4d,
                                            **flagger_kwargs)
    t, b, c, p = vis4d.shape
    vis = vis4d[..., 0].reshape(t * b, c)
    wgt = w[..., 0].reshape(t * b, c)
    if beam_gain is not None:
        g = jnp.asarray(beam_gain).reshape(t * b, c)
        wgt = jnp.where(g > 0, wgt / g.astype(wgt.dtype),
                        jnp.zeros((), wgt.dtype))
    return vis, wgt, float(frac)


def station_beam_power(element_x, element_y, element_z, weights,
                       pointing_lmn, freq_hz: float) -> Array:
    """|station beam|^2 towards given (l, m, n) directions — the gain
    factor for primary-beam weighting (aperture_array DFT,
    station_beam/sdp_station.h:121-140)."""
    wavenumber = 2.0 * jnp.pi * freq_hz / 299792458.0
    lmn = jnp.asarray(pointing_lmn)
    beam = aperture_array(
        wavenumber, jnp.asarray(weights), jnp.asarray(element_x),
        jnp.asarray(element_y), jnp.asarray(element_z),
        lmn[:, 0], lmn[:, 1], lmn[:, 2])
    return jnp.abs(beam) ** 2

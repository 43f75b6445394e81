"""Distributed SwiFTly on the 8-device mesh.

The distributed chains (traced offsets + one all_to_all) must reproduce
the local static-offset chains exactly, and the analytic point-source
oracle (the reference pattern from tests/fourier_transforms/helpers.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_func_tpu.fourier_transforms import Swiftly
from ska_sdp_func_tpu.parallel import make_mesh
from ska_sdp_func_tpu.parallel.swiftly_dist import SwiftlyDistributed

PARAMS = dict(W=13.5625, N=1024, yN_size=512, xM_size=256)
D = 8
YB = 128     # facet size: D * YB == N
XA = 128     # subgrid size: D * XA == N
OFFS = [(d - D // 2) * 128 + 64 for d in range(D)]


def facet_from_sources(sources, image_size, facet_size, facet_offset):
    facet = np.zeros(facet_size, complex)
    for intensity, x in sources:
        pos = (x - facet_offset + facet_size // 2) % image_size
        if 0 <= pos < facet_size:
            facet[pos] += intensity
    return facet


def subgrid_from_sources(sources, image_size, subgrid_size, subgrid_offset):
    us = np.arange(subgrid_offset - subgrid_size // 2,
                   subgrid_offset + (subgrid_size + 1) // 2)
    subgrid = np.zeros(subgrid_size, complex)
    for intensity, x in sources:
        subgrid += (intensity / image_size) * np.exp(
            2j * np.pi * us * x / image_size)
    return subgrid


@pytest.fixture(scope="module")
def setup():
    sw = Swiftly(PARAMS["N"], PARAMS["yN_size"], PARAMS["xM_size"],
                 PARAMS["W"])
    rng = np.random.default_rng(7)
    sources = [(float(rng.standard_normal()), int(x))
               for x in rng.integers(-PARAMS["N"] // 2,
                                     PARAMS["N"] // 2 - 1, 12)]
    facets = np.stack([
        facet_from_sources(sources, PARAMS["N"], YB, off) for off in OFFS])
    dist = SwiftlyDistributed(sw, make_mesh(D))
    return dict(sw=sw, dist=dist, facets=facets, sources=sources)


def _local_facets_to_subgrids(sw, facets):
    """Reference: the local static-offset chain, all pairs."""
    out = []
    for sg_off in OFFS:
        acc = jnp.zeros((sw.xM_size,), jnp.complex128)
        for d, f_off in enumerate(OFFS):
            prep = sw.prepare_facet(jnp.asarray(facets[d]), f_off)
            contrib = sw.extract_from_facet(prep, sg_off)
            acc = sw.add_to_subgrid(contrib, acc, f_off)
        out.append(np.asarray(sw.finish_subgrid(acc, XA, sg_off)))
    return np.stack(out)


def test_facets_to_subgrids_matches_local(setup):
    s = setup
    got = np.asarray(s["dist"].facets_to_subgrids(
        jnp.asarray(s["facets"]), OFFS, OFFS, XA))
    want = _local_facets_to_subgrids(s["sw"], s["facets"])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_facets_to_subgrids_matches_analytic(setup):
    s = setup
    got = np.asarray(s["dist"].facets_to_subgrids(
        jnp.asarray(s["facets"]), OFFS, OFFS, XA))
    for m, sg_off in enumerate(OFFS):
        want = subgrid_from_sources(s["sources"], PARAMS["N"], XA, sg_off)
        np.testing.assert_array_almost_equal(got[m], want, decimal=6)


def test_subgrids_to_facets_round_trip(setup):
    """subgrid -> facet adjoint chain: feeding the analytic subgrids
    through the reverse chain must reproduce each facet (the SwiFTly
    round-trip identity on band-limited data)."""
    s = setup
    sw = s["sw"]
    subgrids = np.stack([
        subgrid_from_sources(s["sources"], PARAMS["N"], sw.xM_size, off)
        for off in OFFS])
    got = np.asarray(s["dist"].subgrids_to_facets(
        jnp.asarray(subgrids), OFFS, OFFS, YB))
    # Local reference chain.
    for d, f_off in enumerate(OFFS):
        acc = jnp.zeros((sw.yN_size,), jnp.complex128)
        for m, sg_off in enumerate(OFFS):
            prep = sw.prepare_subgrid_inplace(jnp.asarray(subgrids[m]),
                                              sg_off)
            contrib = sw.extract_from_subgrid(prep, f_off)
            acc = sw.add_to_facet(contrib, acc, sg_off)
        want = np.asarray(sw.finish_facet(acc, YB, f_off))
        np.testing.assert_allclose(got[d], want, atol=1e-12)

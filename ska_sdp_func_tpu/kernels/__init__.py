"""TPU compute kernels for the hot paths.

The reference's CUDA scatter/gather gridding kernels
(grid_data/sdp_gridder_wtower_uvw.cu: one thread per row, atomicAdd on
the subgrid) have no efficient XLA scatter equivalent — TPU has no
atomics and `scatter-add` with data-dependent indices serializes. The
TPU-native replacement reformulates the separable kernel tap as dense
banded matmuls on the MXU (:mod:`.dense_tap`).
"""

from .dense_tap import degrid_plane_dense, grid_plane_dense

__all__ = ["degrid_plane_dense", "grid_plane_dense"]

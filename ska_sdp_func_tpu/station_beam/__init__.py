"""Station and element beams (reference: src/ska_sdp_func/station_beam)."""

from .station import aperture_array
from .element import dipole, spherical_wave_harp

__all__ = ["aperture_array", "dipole", "spherical_wave_harp"]

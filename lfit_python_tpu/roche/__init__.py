"""Roche geometry core (L0): potentials, L1, blink visibility, gas stream."""

from .geometry import (
    roche_potential, xl1, l1_potential, earth_vector, ray_clearance,
    blink, findi, eclipse_half_width, lobe_radius,
)
from .stream import stream_trajectory, spot_position

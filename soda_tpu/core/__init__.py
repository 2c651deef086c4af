"""Stencil core (tensor-level IR + scheduling; reference layer L4)."""

from soda_tpu.core.stencil import (  # noqa: F401
    Stencil, get_overall_stencil_window, get_stencil_dim,
    get_stencil_distance, get_stencil_window_offset,
)
from soda_tpu.core.tensor import Tensor  # noqa: F401

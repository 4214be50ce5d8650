"""Host-side utilities (image IO, colormaps, plotting helpers)."""

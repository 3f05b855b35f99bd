"""Small host-side utilities (optical flow, weight conversion)."""

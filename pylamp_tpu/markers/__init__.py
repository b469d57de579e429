from pylamp_tpu.markers.state import MarkerState  # noqa: F401
from pylamp_tpu.markers.interp import markers_to_grid, grid_to_markers  # noqa: F401
from pylamp_tpu.markers.advect import advect_rk4  # noqa: F401
from pylamp_tpu.markers.seed import seed_markers  # noqa: F401

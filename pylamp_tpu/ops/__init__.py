from pylamp_tpu.ops.stokes import stokes_operator, stokes_rhs  # noqa: F401
from pylamp_tpu.ops.energy import energy_operator, energy_rhs  # noqa: F401

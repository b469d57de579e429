from pylamp_tpu.core.grid import StaggeredGrid  # noqa: F401
from pylamp_tpu.core.bc import VelocityBCs, ThermalBCs, ThermalBC  # noqa: F401

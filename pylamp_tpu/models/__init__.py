from pylamp_tpu.models.config import (  # noqa: F401
    ModelConfig,
    PhysicsConfig,
    SolverConfig,
    TimeConfig,
)
from pylamp_tpu.models.state import ModelState  # noqa: F401
from pylamp_tpu.models.step import make_step  # noqa: F401
from pylamp_tpu.models.driver import run_model  # noqa: F401

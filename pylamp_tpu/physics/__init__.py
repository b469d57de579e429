from pylamp_tpu.physics.materials import MaterialTable  # noqa: F401

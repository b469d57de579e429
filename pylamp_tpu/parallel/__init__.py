from pylamp_tpu.parallel.mesh import make_mesh, state_shardings, shard_state  # noqa: F401

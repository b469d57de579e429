from pylamp_tpu.solvers.krylov import cg, fgmres, SolveInfo  # noqa: F401

from pylamp_tpu.cli import main

raise SystemExit(main())

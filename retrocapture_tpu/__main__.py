from retrocapture_tpu.cli import main

raise SystemExit(main())

from bhraytracer_tpu.cli import main

raise SystemExit(main())

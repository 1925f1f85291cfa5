from ppoc_tpu.cli import main

raise SystemExit(main())

from pfn_tpu.train.cli import main

raise SystemExit(main())

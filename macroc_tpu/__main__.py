from macroc_tpu.cli import main

raise SystemExit(main())

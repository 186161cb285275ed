from fpmash_tpu.cli import main

raise SystemExit(main())

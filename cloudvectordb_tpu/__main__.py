from cloudvectordb_tpu.cli import main

raise SystemExit(main())

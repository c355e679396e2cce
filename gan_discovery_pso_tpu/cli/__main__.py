from gan_discovery_pso_tpu.cli.main import main

raise SystemExit(main())

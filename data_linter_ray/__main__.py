from data_linter_ray.cli import main

raise SystemExit(main())

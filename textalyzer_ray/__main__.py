from textalyzer_ray.cli import main

raise SystemExit(main())

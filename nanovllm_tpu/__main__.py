from nanovllm_tpu.cli import main

raise SystemExit(main())

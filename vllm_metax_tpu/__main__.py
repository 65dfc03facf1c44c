import sys

from vllm_metax_tpu.entrypoints.cli import main

sys.exit(main())

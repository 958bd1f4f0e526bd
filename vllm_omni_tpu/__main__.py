from vllm_omni_tpu.entrypoints.cli import main
import sys

sys.exit(main())

import sys

from vllm_omni_tpu.entrypoints.cli import main

if __name__ == "__main__":
    sys.exit(main())

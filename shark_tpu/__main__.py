import sys

from shark_tpu.cli import main

sys.exit(main())

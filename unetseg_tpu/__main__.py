import sys

from unetseg_tpu.cli.main import main

sys.exit(main())

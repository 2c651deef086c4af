"""`python -m soda_tpu` = the sodac-tpu CLI."""

import sys

from soda_tpu.sodac import main

if __name__ == '__main__':
  sys.exit(main())

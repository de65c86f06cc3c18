"""`python -m radiant_rag_tpu` entry (reference `radiant/__main__.py:9-13`)."""

import sys

from radiant_rag_tpu.app import main

if __name__ == "__main__":
    sys.exit(main())

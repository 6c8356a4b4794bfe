"""``python -m cuda_recommender_tpu`` routes to the train CLI."""

import sys

from .cli.train import main

sys.exit(main())

"""`python -m jsonify2ai_spark <subcommand>` entry point."""

import sys

from jsonify2ai_spark.cli import main

sys.exit(main())

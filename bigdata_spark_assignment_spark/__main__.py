"""``python -m bigdata_spark_assignment_spark`` — E1 CLI (see cli.py)."""
import sys

from .cli import main

main(sys.argv[1:])

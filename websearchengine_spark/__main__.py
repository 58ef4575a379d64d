"""``python -m websearchengine_spark`` — see cli.py."""

from websearchengine_spark.cli import main

main()

"""`python -m taxahfe_spark` — CLI entry (see cli.py).

At cluster scale the same module is the spark-submit entry:
    spark-submit --py-files taxahfe_spark.zip -m ... taxahfe_spark/__main__.py run-hfe ...
"""

from taxahfe_spark.cli import main

if __name__ == "__main__":
    main()

"""Interactive shell REPL: `python -m diagonal_b6_spark.shell [world.parquet]`.

The Spark analogue of the reference's web-shell prompt (b6/ui/ui.go): type
expressions like `find [#amenity=pub] | take 10`, get the evaluated
DataFrame printed.  With no argument the built-in test fixture world
loads; with a parquet path, any table in the engine's feature schema
(fixtures.FEATURE_SCHEMA) is the world.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame


def main(argv: list[str]) -> int:
    from .. import fixtures
    from ..session import get_spark
    from .evaluate import Env, ShellError, evaluate_expression
    from .parse import ParseError

    spark = get_spark(app_name="b6-shell")
    if len(argv) > 1:
        feats = spark.read.parquet(argv[1])
    else:
        feats = fixtures.features_table(spark)
    env = Env(spark, feats)
    print("b6 shell on Spark -- expressions like: find [#amenity=pub] | take 10")
    print("world: %s  (ctrl-D to exit)" % (argv[1] if len(argv) > 1 else "fixtures"))
    while True:
        try:
            line = input("b6> ").strip()
        except EOFError:
            print()
            return 0
        if not line:
            continue
        try:
            out = evaluate_expression(line, env)
        except (ParseError, ShellError) as exc:
            print(f"error: {exc}")
            continue
        if isinstance(out, DataFrame):
            out.show(50, truncate=False)
        else:
            print(out)


if __name__ == "__main__":
    sys.exit(main(sys.argv))

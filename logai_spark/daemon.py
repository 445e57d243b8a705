"""Python worker daemon with the heavy imports paid ONCE before forking.

Set ``spark.python.daemon.module=logai_spark.daemon``. The stock
``pyspark.daemon`` forks workers that each import pandas / pyarrow / numpy
(and this package) on first use — roughly 1-2 CPU-seconds per worker. With
dozens of workers per executor across stages this turns into minutes of
aggregate import time and shows up as spawn storms that throttle scaling.
Importing everything in the daemon parent instead lets every forked worker
inherit the modules through copy-on-write for free.

Safe: these imports keep no open file descriptors or threads (fork hazards);
they only build module objects.
"""

# heavy third-party deps used by all our pandas/Arrow UDFs
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

# the worker runtime itself + the Arrow serializers it lazily pulls in
import pyspark.worker  # noqa: F401
import pyspark.sql.pandas.serializers  # noqa: F401

# our own hot-path modules (pure python, cheap, but why pay per fork)
import logai_spark.parse.drain  # noqa: F401
import logai_spark.parse.distributed  # noqa: F401
import logai_spark.sources.webpages  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()

import os

# Pin BLAS/OpenMP pools to one thread BEFORE any test module imports numpy:
# the engine's Python workers always run with this pin (spark/session.py
# sets it at session build, and local-mode workers fork with it), but the
# pytest driver process imports numpy first, and OpenBLAS sizes its pool at
# library load — so without this the kernel wall-time tests measure the
# threaded-pool sync penalty (~8 ms per small LAPACK call; the 96k-point
# banded fit read 218s threaded vs 136s pinned on this box), a
# configuration the engine never runs in.
for _var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

import pytest


@pytest.fixture(scope="session")
def spark():
    from tsdisagg_spark.spark.session import get_spark

    session = get_spark(
        app_name="tsdisagg-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "2g"},
    )
    yield session
    session.stop()

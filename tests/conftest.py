from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from crawlkit.session import get_spark

    s = get_spark(app_name="crawlkit-tests", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def synth_cfg():
    from crawlkit.synth import SynthConfig

    return SynthConfig(n_pages=150, n_hosts=6, n_seeds=5, fanout=3)


@pytest.fixture(scope="session")
def pages(spark, synth_cfg):
    from crawlkit.synth import synth_pages

    df = synth_pages(spark, synth_cfg).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="crawlkit-wh-")
    yield d
    shutil.rmtree(d, ignore_errors=True)

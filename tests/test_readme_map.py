"""README coverage-map completeness (VERDICT r9 task #7).

Every key registered in ``trading_etl_spark/registry.py`` must be findable
in README.md by exact backtick-quoted string, so a user can map any
CORRECTNESS_r{N}.json row back to its operator description — and newborn
queries can't silently skip documentation.
"""

from pathlib import Path

from trading_etl_spark.registry import build_queries


def test_every_registered_key_documented_in_readme():
    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    missing = [k for k in build_queries() if f"`{k}`" not in readme]
    assert not missing, f"registry keys absent from README coverage map: {missing}"

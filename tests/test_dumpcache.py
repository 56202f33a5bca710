"""FIFO + rmtree semantics of the shared disk-dump cache helper."""

import os

from trading_etl_spark.queries._dumpcache import get_or_build_dump


def test_dump_cache_builds_once_and_evicts_with_rmtree(tmp_path):
    cache: dict = {}
    builds = []

    def make(name):
        def make_root():
            root = str(tmp_path / name)
            os.makedirs(root, exist_ok=True)
            return root

        def build(root):
            builds.append(name)
            with open(os.path.join(root, "data"), "w") as f:
                f.write(name)

        return make_root, build

    mk_a, bd_a = make("a")
    root_a = get_or_build_dump(cache, 2, "ka", mk_a, bd_a)
    assert get_or_build_dump(cache, 2, "ka", mk_a, bd_a) == root_a
    assert builds == ["a"]  # cached, not rebuilt

    mk_b, bd_b = make("b")
    get_or_build_dump(cache, 2, "kb", mk_b, bd_b)
    mk_c, bd_c = make("c")
    get_or_build_dump(cache, 2, "kc", mk_c, bd_c)  # evicts ka (FIFO)

    assert "ka" not in cache and not os.path.exists(root_a)  # rmtree'd
    assert set(cache) == {"kb", "kc"}
    assert builds == ["a", "b", "c"]


def test_dump_cache_failed_build_does_not_cache(tmp_path):
    cache: dict = {}

    def make_root():
        root = str(tmp_path / "x")
        os.makedirs(root, exist_ok=True)
        return root

    def bad_build(root):
        raise RuntimeError("boom")

    import pytest

    with pytest.raises(RuntimeError):
        get_or_build_dump(cache, 2, "k", make_root, bad_build)
    assert not cache  # a failed build must not poison the cache

"""Result cache (Q13): LRU semantics (lru_cache.go:28-84) + the
staleness safety the reference lacks (SURVEY.md Q13: only deletes
invalidate there; here index_version keying makes upserts invalidate
implicitly)."""

import pytest

from oasisdb_spark.cache import SearchCache


def test_lru_eviction_order():
    c = SearchCache(capacity=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1  # refresh a → b is now LRU
    c.put("c", 3)
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3
    assert len(c) == 2


def test_hit_miss_counters_and_prefix_invalidation():
    c = SearchCache(capacity=8)
    k1 = c.key("coll", 0, [1.0, 2.0], 5)
    k2 = c.key("coll", 0, [3.0, 4.0], 5)
    k3 = c.key("other", 0, [1.0, 2.0], 5)
    for k in (k1, k2, k3):
        c.put(k, "r")
    assert c.get(k1) == "r" and c.hits == 1
    assert c.get("nope") is None and c.misses == 1
    assert c.invalidate_prefix("coll") == 2
    assert c.get(k1) is None and len(c) == 1


def test_key_depends_on_index_version_and_payload():
    ks = {
        SearchCache.key("c", 0, [1.0], 5),
        SearchCache.key("c", 1, [1.0], 5),  # rebuild → different key
        SearchCache.key("c", 0, [2.0], 5),
        SearchCache.key("c", 0, [1.0], 6),
        SearchCache.key("d", 0, [1.0], 5),
    }
    assert len(ks) == 5


def test_invalid_capacity():
    with pytest.raises(ValueError):
        SearchCache(capacity=0)


def test_cached_search_end_to_end(spark, tmp_path):
    from oasisdb_spark.catalog import Catalog
    from oasisdb_spark.search import build_index, cached_search_vectors

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_collection("c", dimension=3, index_type="flat")
    docs = spark.createDataFrame(
        [(str(i), [float(i), 0.0, 0.0]) for i in range(6)], "id STRING, vector ARRAY<FLOAT>"
    )
    cat.upsert_documents("c", docs)
    cache = SearchCache(capacity=4)

    r1 = cached_search_vectors(cat, "c", [2.1, 0.0, 0.0], 2, cache)
    assert [r[0] for r in r1] == ["2", "3"]
    assert (cache.hits, cache.misses) == (0, 1)

    r2 = cached_search_vectors(cat, "c", [2.1, 0.0, 0.0], 2, cache)
    assert r2 == r1 and cache.hits == 1

    # upsert moves doc 3 next to the query; rebuild bumps index_version
    cat.upsert_documents(
        "c", spark.createDataFrame([("3", [2.0, 0.0, 0.0])], "id STRING, vector ARRAY<FLOAT>")
    )
    build_index(cat, "c")
    r3 = cached_search_vectors(cat, "c", [2.1, 0.0, 0.0], 2, cache)
    assert [r[0] for r in r3] == ["2", "3"] or [r[0] for r in r3] == ["3", "2"]
    assert cache.misses == 2  # version bump → no stale hit
    assert r3[0][1] <= r1[0][1]  # nearer neighbor after the update

"""Golden end-to-end test (SURVEY.md §5.3): fixture ingest → bronze JSON →
flatten+specs → silver parquet → gold marts, with the reference's quirk
semantics asserted (lossy pitstop join, competition-rank ties, string
durations)."""

from __future__ import annotations

import pytest

from formula_1_spark.config import EngineConfig
from formula_1_spark.plans.medallion import (
    build_constructor_standings,
    build_driver_standings,
    clean_bronze,
    transform_silver,
)
from formula_1_spark.sources.ingest import fixture_fetchers, run_snapshot


@pytest.fixture(scope="module")
def lake(tmp_path_factory, spark):
    cfg = EngineConfig(lake_root=str(tmp_path_factory.mktemp("lake")))
    fetchers = fixture_fetchers(seasons=[2011, 2023], drivers_per_race=6)
    snap = run_snapshot(cfg, fetchers, limit=4)  # small limit → pagination
    silver = clean_bronze(spark, snapshot_dir=snap, cfg=cfg)
    gold = transform_silver(spark, cfg=cfg)
    return cfg, snap, silver, gold


def test_ingest_pagination(lake):
    import os

    cfg, snap, *_ = lake
    # 2 seasons x 3 races = 6 race docs at limit=4 → 2 pages for results.
    pages = sorted(os.listdir(os.path.join(snap, "results")))
    assert pages == ["results_1.json", "results_2.json"]


def test_silver_schemas_and_types(lake, spark):
    cfg, _, silver, _ = lake
    results = spark.read.parquet(silver["results"])
    assert dict(results.dtypes)["points"] == "double"
    assert dict(results.dtypes)["position"] == "int"
    assert dict(results.dtypes)["date"] == "date"
    # Quirk #5: durations stay strings.
    assert dict(results.dtypes)["fastestLapTime"] == "string"
    assert dict(results.dtypes)["raceTime"] == "string"
    assert "ingestionDate" in results.columns
    # 2 seasons x 3 races x 6 drivers
    assert results.count() == 36

    pitstops = spark.read.parquet(silver["pitstops"])
    # Year gate: only 2023 races have stops; 2011 races land as
    # explode_outer null rows which the spec keeps with NULL driverRef.
    assert pitstops.filter("year = 2023 AND driverRef IS NOT NULL").count() > 0
    assert pitstops.filter("year = 2011 AND driverRef IS NOT NULL").count() == 0


def test_gold_lossy_pitstop_join_quirk(lake, spark):
    cfg, _, _, gold = lake
    rr = spark.read.parquet(gold["raceResults"])
    # INNER join vs the pitstop aggregate: all of 2011 vanishes (no
    # pitstop data) and only pitstopping drivers of 2023 survive.
    years = {r["year"] for r in rr.select("year").distinct().collect()}
    assert years == {2023}
    assert rr.count() == 9  # 3 races x 3 pitstopping drivers (i % 2 == 0)


def test_gold_corrected_left_join_variant(lake, spark):
    cfg, _, silver, _ = lake
    read = lambda n: spark.read.parquet(silver[n])  # noqa: E731
    from formula_1_spark.plans.medallion import build_race_results

    rr = build_race_results(
        read("results"),
        read("drivers"),
        read("constructors"),
        read("circuits"),
        read("pitstops"),
        lossy_pitstop_join=False,
    )
    assert rr.count() == 36  # nothing dropped
    assert rr.filter("numberOfPitstops IS NULL").count() == 27


def test_standings_competition_rank_ties(lake, spark):
    cfg, _, _, gold = lake
    ds = spark.read.parquet(gold["driverStandings"])
    rows = ds.filter("year = 2023").orderBy("rank", "surname").collect()
    assert rows[0]["rank"] == 1
    # Competition ranking: ties share a rank and the next rank skips.
    ranks = [r["rank"] for r in rows]
    for i in range(1, len(ranks)):
        assert ranks[i] >= ranks[i - 1]
        # rank value == position of first row with that key (1-based)
        first_idx = ranks.index(ranks[i])
        assert ranks[i] == first_idx + 1

    cs = spark.read.parquet(gold["constructorStandings"])
    assert cs.filter("year = 2023").count() > 0


def test_driver_standings_points_golden(lake, spark):
    """Golden values: the lossy raceResults keeps drivers 0/2/4 (the
    pitstoppers); per race they score 10/6/2 points, x3 races."""
    cfg, _, _, gold = lake
    ds = spark.read.parquet(gold["driverStandings"])
    pts = {
        r["surname"]: (r["totalPoints"], r["wins"], r["rank"])
        for r in ds.filter("year = 2023").collect()
    }
    assert pts == {
        "Last0": (30.0, 3, 1),
        "Last2": (18.0, 0, 2),
        "Last4": (6.0, 0, 3),
    }


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    """CDC golden: crawl season A, refresh; crawl A+B, refresh again
    (merge). The merged silver must equal a from-scratch full rebuild of
    A+B on every business column (ingestionDate audit stamps differ by
    design), and gold built off merged silver must match too. A third
    refresh of an unchanged snapshot must skip every endpoint."""
    from formula_1_spark.config import EngineConfig
    from formula_1_spark.plans.medallion import (
        build_driver_standings,
        build_race_results,
        clean_bronze,
        incremental_silver_refresh,
        read_silver,
    )
    from formula_1_spark.plans.schema_spec import SPECS
    from formula_1_spark.sources.ingest import fixture_fetchers, run_snapshot

    inc_cfg = EngineConfig(lake_root=str(tmp_path / "inc"))
    run_snapshot(inc_cfg, fixture_fetchers(seasons=[2011]), limit=4)
    r1 = incremental_silver_refresh(spark, cfg=inc_cfg)
    assert set(r1.values()) == {"merged"}

    import time

    time.sleep(1.1)  # distinct snapshot_name (second resolution)
    snap2 = run_snapshot(inc_cfg, fixture_fetchers(seasons=[2011, 2023]), limit=4)
    r2 = incremental_silver_refresh(spark, snapshot_dir=snap2, cfg=inc_cfg)
    assert "merged" in r2.values()

    full_cfg = EngineConfig(lake_root=str(tmp_path / "full"))
    snap_full = run_snapshot(full_cfg, fixture_fetchers(seasons=[2011, 2023]), limit=4)
    clean_bronze(spark, snapshot_dir=snap_full, cfg=full_cfg)

    def business_rows(df):
        cols = sorted(c for c in df.columns if c != "ingestionDate")
        return {tuple(str(v) for v in r) for r in df.select(*cols).collect()}

    datasets = sorted(set(r2) & set(SPECS))
    assert len(datasets) == 10  # fixture crawl covers 10 endpoints
    for name in datasets:
        inc = read_silver(spark, inc_cfg, name)
        full = read_silver(spark, full_cfg, name)
        assert business_rows(inc) == business_rows(full), name

    # gold equivalence off the two silver modes
    def gold(cfg):
        rr = build_race_results(
            read_silver(spark, cfg, "results"),
            read_silver(spark, cfg, "drivers"),
            read_silver(spark, cfg, "constructors"),
            read_silver(spark, cfg, "circuits"),
            read_silver(spark, cfg, "pitstops"),
        )
        return business_rows(build_driver_standings(rr))

    assert gold(inc_cfg) == gold(full_cfg)

    # re-refresh of the SAME snapshot: everything skips
    r3 = incremental_silver_refresh(spark, snapshot_dir=snap2, cfg=inc_cfg)
    assert set(r3.values()) == {"skipped"}

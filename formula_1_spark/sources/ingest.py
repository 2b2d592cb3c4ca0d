"""Paginated REST ingestion + offline fixture generator (SURVEY.md §2.1 S1,
§2.11 C1-C5).

The reference crawls the Ergast API with ADF: a first-page probe reads
``MRData.total``, then an Until-loop pages ``offset += limit`` until
``offset + limit >= total`` (``Data Factory/pipeline/01 - Stage Full
Datasets.json:17-44,158-161``), landing each page as
``<endpoint>_<pageNo>.json`` under ``<yyyyMMdd_HHmmss>/<endpoint>/``
(``:139``; dir scheme ``pipeline/00 - Master.json:199``). Year gates: laps
>= 1996, pitstops >= 2012 (``pipeline/04 - Get Race Laps.json:12``,
``04 - Get Race Pitstops.json:12``).

Ingestion stays OUTSIDE the Spark DAG (driver-side Python), exactly like
the reference keeps it in ADF: a REST crawl is inherently serial-per-page
and the lake landing zone is the durable hand-off point. Spark's
parallelism starts at ``spark.read.json`` over the landed files.

The fixture generator produces deterministic Ergast-shaped JSON offline so
the whole medallion pipeline runs with no network.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from formula_1_spark.config import EngineConfig
from formula_1_spark.sources.io import snapshot_name

DEFAULT_LIMIT = 1000  # reference page size (pipeline/01:356-358)
DEFAULT_INTERVAL_S = 0.01  # 10 ms pacing (pipeline/01:92)


def crawl_endpoint(
    fetch_page: Callable[[int, int], dict],
    out_dir: str,
    endpoint: str,
    limit: int = DEFAULT_LIMIT,
    interval_s: float = DEFAULT_INTERVAL_S,
    max_retries: int = 1,
) -> int:
    """Crawl one paginated endpoint into ``out_dir/<endpoint>/``.

    ``fetch_page(limit, offset)`` returns the parsed ``MRData`` envelope
    dict (injected so tests/offline runs use fixtures; a live runner passes
    a requests-backed closure). Returns the number of pages written.
    """
    ep_dir = os.path.join(out_dir, endpoint.replace("/", "_"))
    os.makedirs(ep_dir, exist_ok=True)

    def fetch_with_retry(offset: int) -> dict:
        for attempt in range(max_retries + 1):
            try:
                return fetch_page(limit, offset)
            except Exception:
                if attempt == max_retries:
                    raise
                time.sleep(0.1)
        raise AssertionError("unreachable")

    # Probe page 1 for MRData.total (pipeline/01:17-44).
    page_no, offset = 1, 0
    doc = fetch_with_retry(offset)
    total = int(doc["MRData"]["total"])
    _write_page(ep_dir, endpoint, page_no, doc)

    # Until-loop: offset += limit while offset + limit < total
    # (pipeline/01:158-161 loop condition).
    while offset + limit < total:
        offset += limit
        page_no += 1
        if interval_s:
            time.sleep(interval_s)
        _write_page(ep_dir, endpoint, page_no, fetch_with_retry(offset))
    return page_no


def _write_page(ep_dir: str, endpoint: str, page_no: int, doc: dict) -> None:
    name = f"{endpoint.replace('/', '_')}_{page_no}.json"
    with open(os.path.join(ep_dir, name), "w") as f:
        json.dump(doc, f)


def make_ergast_fetcher(base_url: str, endpoint: str):
    """Live-API page fetcher (requires the ``requests`` package; gated so
    offline environments never import it)."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("requests not available; use a fixture fetcher") from e

    def fetch(limit: int, offset: int) -> dict:
        url = f"{base_url}/{endpoint}.json"
        resp = requests.get(url, params={"limit": limit, "offset": offset}, timeout=100)
        resp.raise_for_status()
        return resp.json()

    return fetch


def run_snapshot(
    cfg: EngineConfig,
    endpoints: dict[str, Callable[[int, int], dict]],
    when=None,
    limit: int = DEFAULT_LIMIT,
) -> str:
    """C1: one master run — crawl every endpoint into a fresh bronze
    snapshot dir; returns the snapshot path. Endpoints run sequentially
    like the reference's ForEach (``00 - Master.json:189``)."""
    snap = os.path.join(cfg.bronze, snapshot_name(when))
    os.makedirs(snap, exist_ok=True)
    for endpoint, fetcher in endpoints.items():
        crawl_endpoint(fetcher, snap, endpoint, limit=limit, interval_s=0)
    return snap


# ---------------------------------------------------------------------------
# Deterministic Ergast-shaped fixture data (offline stand-in for the API).
# ---------------------------------------------------------------------------


def _envelope(table_key: str, table: dict, total: int, limit: int, offset: int) -> dict:
    return {
        "MRData": {
            "xmlns": "http://ergast.com/mrd/1.5",
            "series": "f1",
            "url": "http://fixture.local",
            "limit": str(limit),
            "offset": str(offset),
            "total": str(total),
            table_key: table,
        }
    }


def fixture_fetchers(
    seasons: list[int], drivers_per_race: int = 6, races_per_season: int = 3
) -> dict[str, Callable[[int, int], dict]]:
    """Build per-endpoint fixture fetchers producing a small, fully
    deterministic 2+-season Ergast-shaped dataset (arrays-of-structs,
    nesting depth 7 via Results→FastestLap→AverageSpeed→speed, empty
    PitStops arrays pre-2012 — everything the flattener must handle)."""

    driver_ids = [f"driver_{i}" for i in range(drivers_per_race)]
    constructor_ids = [f"cons_{i % 3}" for i in range(drivers_per_race)]
    circuit_ids = [f"circuit_{r}" for r in range(races_per_season)]

    def circuits(limit: int, offset: int) -> dict:
        items = [
            {
                "circuitId": cid,
                "url": "http://fixture.local/c",
                "circuitName": f"Circuit {i}",
                "Location": {
                    "lat": f"{10.5 + i}",
                    "long": f"{-3.25 * i}",
                    "locality": f"Town{i}",
                    "country": f"Country{i % 2}",
                },
            }
            for i, cid in enumerate(circuit_ids)
        ]
        page = items[offset : offset + limit]
        return _envelope("CircuitTable", {"Circuits": page}, len(items), limit, offset)

    def drivers(limit: int, offset: int) -> dict:
        items = [
            {
                "driverId": did,
                "permanentNumber": str(10 + i),
                "code": f"D{i:02d}",
                "url": "http://fixture.local/d",
                "givenName": f"First{i}",
                "familyName": f"Last{i}",
                "dateOfBirth": f"199{i % 10}-0{(i % 9) + 1}-1{i % 9}",
                "nationality": f"Nat{i % 3}",
            }
            for i, did in enumerate(driver_ids)
        ]
        page = items[offset : offset + limit]
        return _envelope("DriverTable", {"Drivers": page}, len(items), limit, offset)

    def constructors(limit: int, offset: int) -> dict:
        uniq = sorted(set(constructor_ids))
        items = [
            {
                "constructorId": cid,
                "url": "http://fixture.local/t",
                "name": f"Team {cid[-1]}",
                "nationality": f"Nat{i % 2}",
            }
            for i, cid in enumerate(uniq)
        ]
        page = items[offset : offset + limit]
        return _envelope(
            "ConstructorTable", {"Constructors": page}, len(items), limit, offset
        )

    def _race_header(season: int, rnd: int) -> dict:
        cid = circuit_ids[rnd - 1]
        return {
            "season": str(season),
            "round": str(rnd),
            "url": "http://fixture.local/r",
            "raceName": f"GP {rnd} {season}",
            "Circuit": {
                "circuitId": cid,
                "url": "http://fixture.local/c",
                "circuitName": f"Circuit {rnd - 1}",
                "Location": {
                    "lat": "0",
                    "long": "0",
                    "locality": "x",
                    "country": "y",
                },
            },
            "date": f"{season}-0{rnd}-0{rnd}",
            "time": "13:00:00Z",
        }

    def results(limit: int, offset: int) -> dict:
        races = []
        for season in seasons:
            for rnd in range(1, races_per_season + 1):
                race = _race_header(season, rnd)
                race["Results"] = [
                    {
                        "number": str(10 + i),
                        "position": str(i + 1),
                        "positionText": str(i + 1),
                        "points": str(float(max(0, 10 - 2 * i))),
                        "Driver": {
                            "driverId": did,
                            "url": "u",
                            "givenName": f"First{i}",
                            "familyName": f"Last{i}",
                            "dateOfBirth": "1990-01-01",
                            "nationality": f"Nat{i % 3}",
                        },
                        "Constructor": {
                            "constructorId": constructor_ids[i],
                            "url": "u",
                            "name": f"Team {constructor_ids[i][-1]}",
                            "nationality": "n",
                        },
                        "grid": str(((i + rnd) % drivers_per_race) + 1),
                        "laps": "50",
                        "status": "Finished" if i < drivers_per_race - 1 else "Engine",
                        "Time": {"millis": str(5400000 + 1000 * i), "time": f"1:30:{i:02d}.000"},
                        "FastestLap": {
                            "rank": str(i + 1),
                            "lap": str(20 + i),
                            "Time": {"time": f"1:2{i}.45{i}"},
                            "AverageSpeed": {
                                "units": "kph",
                                "speed": f"{200.5 + i}",
                            },
                        },
                    }
                    for i, did in enumerate(driver_ids)
                ]
                races.append(race)
        page = races[offset : offset + limit]
        return _envelope(
            "RaceTable", {"season": str(seasons[0]), "Races": page}, len(races), limit, offset
        )

    def pitstops(limit: int, offset: int) -> dict:
        races = []
        for season in seasons:
            for rnd in range(1, races_per_season + 1):
                race = _race_header(season, rnd)
                # Year gate semantics (C4): pitstop data exists only >= 2012.
                race["PitStops"] = (
                    [
                        {
                            "driverId": did,
                            "lap": str(15 + 10 * s),
                            "stop": str(s + 1),
                            "time": "14:05:11",
                            "duration": f"2{s}.45{i}",
                        }
                        for i, did in enumerate(driver_ids)
                        if i % 2 == 0  # only some drivers stop → lossy-join quirk visible
                        for s in range((i % 2) + 1)
                    ]
                    if season >= 2012
                    else []
                )
                races.append(race)
        page = races[offset : offset + limit]
        return _envelope(
            "RaceTable", {"season": str(seasons[0]), "Races": page}, len(races), limit, offset
        )

    def schedule(limit: int, offset: int) -> dict:
        races = [
            _race_header(season, rnd)
            for season in seasons
            for rnd in range(1, races_per_season + 1)
        ]
        page = races[offset : offset + limit]
        return _envelope(
            "RaceTable", {"season": str(seasons[0]), "Races": page}, len(races), limit, offset
        )

    def seasons_ep(limit: int, offset: int) -> dict:
        items = [{"season": str(s), "url": "u"} for s in seasons]
        page = items[offset : offset + limit]
        return _envelope("SeasonTable", {"Seasons": page}, len(items), limit, offset)

    def laps(limit: int, offset: int) -> dict:
        # Doubly-nested arrays: Races[].Laps[].Timings[] — the deepest
        # flattener path in the real Ergast feed. Year gate: >= 1996.
        races = []
        for season in seasons:
            for rnd in range(1, races_per_season + 1):
                race = _race_header(season, rnd)
                race["Laps"] = (
                    [
                        {
                            "number": str(lap),
                            "Timings": [
                                {
                                    "driverId": did,
                                    "position": str(((i + lap) % drivers_per_race) + 1),
                                    "time": f"1:3{lap}.{100 + i}",
                                }
                                for i, did in enumerate(driver_ids[:3])
                            ],
                        }
                        for lap in range(1, 3)
                    ]
                    if season >= 1996
                    else []
                )
                races.append(race)
        page = races[offset : offset + limit]
        return _envelope(
            "RaceTable", {"season": str(seasons[0]), "Races": page}, len(races), limit, offset
        )

    def qualifying(limit: int, offset: int) -> dict:
        races = []
        for season in seasons:
            for rnd in range(1, races_per_season + 1):
                race = _race_header(season, rnd)
                race["QualifyingResults"] = [
                    {
                        "number": str(10 + i),
                        "position": str(i + 1),
                        "Driver": {"driverId": did, "url": "u"},
                        "Constructor": {"constructorId": constructor_ids[i], "url": "u"},
                        "Q1": f"1:2{i}.00{i}",
                        # Q2/Q3 only for the top qualifiers (sparse fields).
                        **({"Q2": f"1:2{i}.10{i}"} if i < 4 else {}),
                        **({"Q3": f"1:2{i}.20{i}"} if i < 2 else {}),
                    }
                    for i, did in enumerate(driver_ids)
                ]
                races.append(race)
        page = races[offset : offset + limit]
        return _envelope(
            "RaceTable", {"season": str(seasons[0]), "Races": page}, len(races), limit, offset
        )

    def status(limit: int, offset: int) -> dict:
        items = [
            {"statusId": "1", "count": str(drivers_per_race - 1), "status": "Finished"},
            {"statusId": "5", "count": "1", "status": "Engine"},
        ]
        page = items[offset : offset + limit]
        return _envelope("StatusTable", {"Status": page}, len(items), limit, offset)

    return {
        "circuits": circuits,
        "drivers": drivers,
        "constructors": constructors,
        "results": results,
        "pitstops": pitstops,
        "schedule": schedule,
        "seasons": seasons_ep,
        "laps": laps,
        "qualifying": qualifying,
        "status": status,
    }

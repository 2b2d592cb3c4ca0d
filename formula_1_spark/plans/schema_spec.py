"""Declarative per-dataset schema specs (SURVEY.md §2.2 P4).

Replaces the reference's 140-line, 11-branch ``renameAddSchema``
(``Notebooks/Clean Bronze Data.py:112-254``) with pure data: each silver
dataset declares its path-encoded source columns, business renames, casts,
drops and derived columns once; one generic applicator turns any flattened
bronze DataFrame into its typed silver shape.

Semantics preserved exactly (bug-for-bug where SURVEY §2.12 demands):

* duration-like columns (``lapTime``, ``pitstopDuration``, ``q1``-``q3``,
  ``fastestLapTime``, ``raceTime``) stay strings (quirk #5);
* ``ingestionDate`` audit column — ``from_utc_timestamp(current_timestamp,
  tz)`` with the reference's ``Pacific/Auckland`` default (quirk #7);
* datetime assembly: ``to_timestamp(concat(date, ' ', regexp_replace(time,
  'Z', '')), 'yyyy-MM-dd HH:mm:ss')`` (``Clean Bronze Data.py:132-143``).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class DatasetSpec:
    """Declarative silver schema for one bronze endpoint."""

    name: str
    # path-encoded (or already-flat) source column -> business name
    renames: dict[str, str] = dc_field(default_factory=dict)
    # business name -> Spark SQL type string
    casts: dict[str, str] = dc_field(default_factory=dict)
    # source columns to drop (envelope fields etc.); missing ones ignored
    drops: list[str] = dc_field(default_factory=list)
    # business name -> (date_col, time_col) assembled into a timestamp
    datetime_cols: dict[str, tuple[str, str]] = dc_field(default_factory=dict)
    add_ingestion_date: bool = True
    # natural key for CDC-style MERGE into silver (incremental refresh);
    # empty => the dataset only supports snapshot-overwrite
    merge_keys: list[str] = dc_field(default_factory=list)


def assemble_datetime(date_col: str, time_col: str) -> Column:
    """F1/F2/F3: strip 'Z', concat date + time, parse as timestamp
    (reference ``Clean Bronze Data.py:132-143``)."""
    return F.to_timestamp(
        F.concat(
            F.col(date_col), F.lit(" "), F.regexp_replace(F.col(time_col), "Z", "")
        ),
        "yyyy-MM-dd HH:mm:ss",
    )


def apply_spec(
    df: DataFrame, spec: DatasetSpec, ingestion_tz: str = "Pacific/Auckland"
) -> DataFrame:
    """Apply a :class:`DatasetSpec`: drop → rename → cast → derive.

    Single ``select`` so the optimizer sees one projection; unreferenced
    source columns are pruned all the way into the scan.
    """
    existing = set(df.columns)
    cols: list[Column] = []
    for src, dst in spec.renames.items():
        if src not in existing:
            continue
        c = F.col(f"`{src}`")
        if dst in spec.casts:
            c = c.cast(spec.casts[dst])
        cols.append(c.alias(dst))

    out = df.select(*cols)
    for dst, (date_col, time_col) in spec.datetime_cols.items():
        out = out.withColumn(dst, assemble_datetime(date_col, time_col))
    if spec.add_ingestion_date:
        out = out.withColumn(
            "ingestionDate",
            F.from_utc_timestamp(F.current_timestamp(), ingestion_tz),
        )
    return out


def _p(*segments: str) -> str:
    """Build a reference-style path-encoded column name:
    ``_p('MRData', 'CircuitTable', 'Circuits', 'circuitId')`` →
    ``'MRData*1->CircuitTable*2->Circuits*3->circuitId*4'``."""
    return "->".join(f"{s}*{i + 1}" for i, s in enumerate(segments))


# ---------------------------------------------------------------------------
# Silver dataset catalog — the reference's 11 endpoint branches
# (Clean Bronze Data.py:112-254), as data.
# ---------------------------------------------------------------------------

CIRCUITS = DatasetSpec(
    name="circuits",
    renames={
        _p("MRData", "CircuitTable", "Circuits", "circuitId"): "circuitRef",
        _p("MRData", "CircuitTable", "Circuits", "circuitName"): "circuitName",
        _p("MRData", "CircuitTable", "Circuits", "Location", "country"): "country",
        _p("MRData", "CircuitTable", "Circuits", "Location", "locality"): "locality",
        _p("MRData", "CircuitTable", "Circuits", "Location", "lat"): "latitude",
        _p("MRData", "CircuitTable", "Circuits", "Location", "long"): "longitude",
    },
    casts={"latitude": "double", "longitude": "double"},
    merge_keys=['circuitRef'],
)

SCHEDULE = DatasetSpec(
    name="schedule",
    renames={
        _p("MRData", "RaceTable", "Races", "season"): "year",
        _p("MRData", "RaceTable", "Races", "round"): "round",
        _p("MRData", "RaceTable", "Races", "raceName"): "raceName",
        _p("MRData", "RaceTable", "Races", "Circuit", "circuitId"): "circuitRef",
        _p("MRData", "RaceTable", "Races", "date"): "date",
        _p("MRData", "RaceTable", "Races", "time"): "time",
    },
    casts={"year": "int", "round": "int", "date": "date"},
    datetime_cols={"dateTime": ("date", "time")},
    merge_keys=['year', 'round'],
)

CONSTRUCTORS = DatasetSpec(
    name="constructors",
    renames={
        _p("MRData", "ConstructorTable", "Constructors", "constructorId"): "constructorRef",
        _p("MRData", "ConstructorTable", "Constructors", "name"): "constructorName",
        _p("MRData", "ConstructorTable", "Constructors", "nationality"): "constructorNationality",
    },
    merge_keys=['constructorRef'],
)

DRIVERS = DatasetSpec(
    name="drivers",
    renames={
        _p("MRData", "DriverTable", "Drivers", "driverId"): "driverRef",
        _p("MRData", "DriverTable", "Drivers", "givenName"): "firstName",
        _p("MRData", "DriverTable", "Drivers", "familyName"): "surname",
        _p("MRData", "DriverTable", "Drivers", "dateOfBirth"): "dateOfBirth",
        _p("MRData", "DriverTable", "Drivers", "nationality"): "nationality",
        _p("MRData", "DriverTable", "Drivers", "permanentNumber"): "permanentNumber",
    },
    casts={"dateOfBirth": "date", "permanentNumber": "int"},
    merge_keys=['driverRef'],
)

RESULTS = DatasetSpec(
    name="results",
    renames={
        _p("MRData", "RaceTable", "Races", "season"): "year",
        _p("MRData", "RaceTable", "Races", "round"): "round",
        _p("MRData", "RaceTable", "Races", "raceName"): "raceName",
        _p("MRData", "RaceTable", "Races", "Circuit", "circuitId"): "circuitRef",
        _p("MRData", "RaceTable", "Races", "date"): "date",
        _p("MRData", "RaceTable", "Races", "Results", "number"): "number",
        _p("MRData", "RaceTable", "Races", "Results", "position"): "position",
        _p("MRData", "RaceTable", "Races", "Results", "positionText"): "positionText",
        _p("MRData", "RaceTable", "Races", "Results", "points"): "points",
        _p("MRData", "RaceTable", "Races", "Results", "grid"): "startGrid",
        _p("MRData", "RaceTable", "Races", "Results", "laps"): "lapsCompleted",
        _p("MRData", "RaceTable", "Races", "Results", "status"): "status",
        _p("MRData", "RaceTable", "Races", "Results", "Driver", "driverId"): "driverRef",
        _p("MRData", "RaceTable", "Races", "Results", "Constructor", "constructorId"): "constructorRef",
        _p("MRData", "RaceTable", "Races", "Results", "Time", "millis"): "millis",
        _p("MRData", "RaceTable", "Races", "Results", "Time", "time"): "raceTime",
        _p("MRData", "RaceTable", "Races", "Results", "FastestLap", "rank"): "fastestLapRank",
        _p("MRData", "RaceTable", "Races", "Results", "FastestLap", "lap"): "fastestLapNumber",
        _p("MRData", "RaceTable", "Races", "Results", "FastestLap", "Time", "time"): "fastestLapTime",
        _p(
            "MRData", "RaceTable", "Races", "Results", "FastestLap", "AverageSpeed", "speed"
        ): "fastestLapAverageSpeed",
    },
    casts={
        "year": "int",
        "round": "int",
        "date": "date",
        "number": "int",
        "position": "int",
        "points": "double",
        "startGrid": "int",
        "lapsCompleted": "int",
        "millis": "int",
        "fastestLapRank": "int",
        "fastestLapNumber": "int",
        "fastestLapAverageSpeed": "double",
        # raceTime / fastestLapTime deliberately stay strings (quirk #5).
    },
    merge_keys=['year', 'round', 'driverRef'],
)

PITSTOPS = DatasetSpec(
    name="pitstops",
    renames={
        _p("MRData", "RaceTable", "Races", "season"): "year",
        _p("MRData", "RaceTable", "Races", "round"): "round",
        _p("MRData", "RaceTable", "Races", "Circuit", "circuitId"): "circuitRef",
        _p("MRData", "RaceTable", "Races", "date"): "date",
        _p("MRData", "RaceTable", "Races", "PitStops", "driverId"): "driverRef",
        _p("MRData", "RaceTable", "Races", "PitStops", "stop"): "stopNo",
        _p("MRData", "RaceTable", "Races", "PitStops", "lap"): "lapNumber",
        _p("MRData", "RaceTable", "Races", "PitStops", "duration"): "pitstopDuration",
    },
    casts={"year": "int", "round": "int", "date": "date", "stopNo": "int", "lapNumber": "int"},
    merge_keys=['year', 'round', 'driverRef', 'stopNo'],
)

LAPS = DatasetSpec(
    name="laps",
    renames={
        _p("MRData", "RaceTable", "Races", "season"): "year",
        _p("MRData", "RaceTable", "Races", "round"): "round",
        _p("MRData", "RaceTable", "Races", "Circuit", "circuitId"): "circuitRef",
        _p("MRData", "RaceTable", "Races", "date"): "date",
        _p("MRData", "RaceTable", "Races", "Laps", "number"): "lapNumber",
        _p("MRData", "RaceTable", "Races", "Laps", "Timings", "driverId"): "driverRef",
        _p("MRData", "RaceTable", "Races", "Laps", "Timings", "position"): "position",
        _p("MRData", "RaceTable", "Races", "Laps", "Timings", "time"): "lapTime",
    },
    casts={"year": "int", "round": "int", "date": "date", "lapNumber": "int", "position": "int"},
    merge_keys=['year', 'round', 'driverRef', 'lapNumber'],
)

QUALIFYING = DatasetSpec(
    name="qualifying",
    renames={
        _p("MRData", "RaceTable", "Races", "season"): "year",
        _p("MRData", "RaceTable", "Races", "round"): "round",
        _p("MRData", "RaceTable", "Races", "Circuit", "circuitId"): "circuitRef",
        _p("MRData", "RaceTable", "Races", "date"): "date",
        _p("MRData", "RaceTable", "Races", "QualifyingResults", "Driver", "driverId"): "driverRef",
        _p(
            "MRData", "RaceTable", "Races", "QualifyingResults", "Constructor", "constructorId"
        ): "constructorRef",
        _p("MRData", "RaceTable", "Races", "QualifyingResults", "position"): "position",
        _p("MRData", "RaceTable", "Races", "QualifyingResults", "Q1"): "q1",
        _p("MRData", "RaceTable", "Races", "QualifyingResults", "Q2"): "q2",
        _p("MRData", "RaceTable", "Races", "QualifyingResults", "Q3"): "q3",
    },
    casts={"year": "int", "round": "int", "date": "date", "position": "int"},
    merge_keys=['year', 'round', 'driverRef'],
)

DRIVER_STANDINGS = DatasetSpec(
    name="driverStandings",
    renames={
        _p("MRData", "StandingsTable", "StandingsLists", "season"): "year",
        _p("MRData", "StandingsTable", "StandingsLists", "round"): "round",
        _p(
            "MRData", "StandingsTable", "StandingsLists", "DriverStandings", "Driver", "driverId"
        ): "driverRef",
        _p("MRData", "StandingsTable", "StandingsLists", "DriverStandings", "points"): "points",
        _p("MRData", "StandingsTable", "StandingsLists", "DriverStandings", "position"): "position",
        _p("MRData", "StandingsTable", "StandingsLists", "DriverStandings", "wins"): "wins",
    },
    casts={"year": "int", "round": "int", "points": "double", "position": "int", "wins": "int"},
    merge_keys=['year', 'round', 'driverRef'],
)

CONSTRUCTOR_STANDINGS = DatasetSpec(
    name="constructorStandings",
    renames={
        _p("MRData", "StandingsTable", "StandingsLists", "season"): "year",
        _p("MRData", "StandingsTable", "StandingsLists", "round"): "round",
        _p(
            "MRData",
            "StandingsTable",
            "StandingsLists",
            "ConstructorStandings",
            "Constructor",
            "constructorId",
        ): "constructorRef",
        _p(
            "MRData", "StandingsTable", "StandingsLists", "ConstructorStandings", "points"
        ): "points",
        _p(
            "MRData", "StandingsTable", "StandingsLists", "ConstructorStandings", "position"
        ): "position",
        _p("MRData", "StandingsTable", "StandingsLists", "ConstructorStandings", "wins"): "wins",
    },
    casts={"year": "int", "round": "int", "points": "double", "position": "int", "wins": "int"},
    merge_keys=['year', 'round', 'constructorRef'],
)

SEASONS = DatasetSpec(
    name="seasons",
    renames={_p("MRData", "SeasonTable", "Seasons", "season"): "season"},
    casts={"season": "int"},
    merge_keys=['season'],
)

STATUS = DatasetSpec(
    name="status",
    renames={
        _p("MRData", "StatusTable", "Status", "statusId"): "statusId",
        _p("MRData", "StatusTable", "Status", "status"): "status",
        _p("MRData", "StatusTable", "Status", "count"): "count",
    },
    casts={"statusId": "int", "count": "int"},
    merge_keys=['statusId'],
)

SPECS: dict[str, DatasetSpec] = {
    s.name: s
    for s in [
        CIRCUITS,
        SCHEDULE,
        CONSTRUCTORS,
        DRIVERS,
        RESULTS,
        PITSTOPS,
        LAPS,
        QUALIFYING,
        DRIVER_STANDINGS,
        CONSTRUCTOR_STANDINGS,
        SEASONS,
        STATUS,
    ]
}

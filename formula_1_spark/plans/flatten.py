"""Generic recursive JSON flattener (SURVEY.md §2.2 P3).

Behavioral re-design of the reference flattener (``Notebooks/Clean Bronze
Data.py:53-102``): arbitrarily nested struct/array DataFrames are reduced
to a flat schema where every column name is the lossless path string
``parent->child*depth`` (initial ``*1`` suffix per ``:45-51``; struct
expansion naming per ``:97``; ``#1`` suffix on name collision per
``:82-84``).

Differences from the reference (deliberate, SURVEY §2.12 #6):

* ``isinstance``-based type dispatch instead of fragile string-prefix
  matching on ``str(dataType)``;
* an iterative worklist instead of unbounded recursion;
* all structs at a given pass are expanded in ONE ``select`` — the logical
  plan stays shallow (one projection per nesting level instead of one per
  column), which keeps Catalyst analysis cheap on wide schemas.

Everything is lazy Column metadata surgery — zero jobs are triggered; the
single terminal write executes one narrow scan→project→explode pipeline
(no shuffle), which is exactly the shape you want for a 100 TB bronze
backfill: it parallelizes per input file and never exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def _suffix_depth(name: str, depth: int) -> str:
    return f"{name}*{depth}"


def index_columns(df: DataFrame, depth: int = 1) -> DataFrame:
    """P2: rename every top-level column to ``name*<depth>`` (flattener
    bookkeeping; reference ``Clean Bronze Data.py:45-51``)."""
    return df.select(
        *[F.col(f"`{c}`").alias(_suffix_depth(c, depth)) for c in df.columns]
    )


def _depth_of(name: str) -> int:
    """Parse the trailing ``*<depth>`` marker of an indexed column name."""
    base, _, d = name.rpartition("*")
    try:
        return int(d.split("#", 1)[0])
    except ValueError:
        return 1


def flatten_json(df: DataFrame, max_passes: int = 64) -> DataFrame:
    """Flatten nested arrays/structs into path-named scalar columns.

    Arrays become rows via ``explode_outer`` (empty/null arrays keep their
    parent row with a NULL — reference ``:68-71``); structs are expanded
    with child columns renamed ``parent->child*(depth+1)``; a ``#1`` suffix
    guards collisions with existing column names. Iterates until no
    ArrayType/StructType column remains.
    """
    df = index_columns(df)

    for _ in range(max_passes):
        fields = df.schema.fields

        # Arrays first, one per pass: each explode_outer multiplies rows,
        # and exploding them one at a time preserves the reference's
        # depth-first row semantics.
        array_field = next(
            (f for f in fields if isinstance(f.dataType, ArrayType)), None
        )
        if array_field is not None:
            name = array_field.name
            df = df.withColumn(name, F.explode_outer(F.col(f"`{name}`")))
            continue

        struct_fields = [f for f in fields if isinstance(f.dataType, StructType)]
        if not struct_fields:
            return df

        # Expand every struct in one projection.
        taken = {f.name for f in fields if not isinstance(f.dataType, StructType)}
        cols = []
        for f in fields:
            if not isinstance(f.dataType, StructType):
                cols.append(F.col(f"`{f.name}`"))
                continue
            depth = _depth_of(f.name)
            for child in f.dataType.fieldNames():
                new_name = f"{f.name}->{_suffix_depth(child, depth + 1)}"
                # Collision guard (reference ':82-84').
                while new_name in taken:
                    new_name += "#1"
                taken.add(new_name)
                cols.append(F.col(f"`{f.name}`").getField(child).alias(new_name))
        df = df.select(*cols)

    raise ValueError(f"flatten_json: nesting deeper than {max_passes} passes")


def leaf_name(path_col: str) -> str:
    """Extract the business leaf name from a path-encoded column
    (``MRData*1->RaceTable*2->season*3`` → ``season``)."""
    leaf = path_col.rsplit("->", 1)[-1]
    return leaf.rpartition("*")[0] or leaf

"""Voter schema registry.

One declared schema reused for every state — the reference's 51
generated per-state Prisma models (copy.ts:5-79) collapse into a
single StructType plus a `state` partition column; Spark partition
pruning replaces the per-state table routing (load.ts:140).

This is the representative 24-column subset from FIXTURES.md §A1;
the full 339-column model (prisma/Voter.prisma:3-345) ports
mechanically the same way (324 strings, 13 ints, 2 dates). The
reference's typing quirks are preserved deliberately:

- Latitude/Longitude are TEXT (Voter.prisma:33-34) — cast on use;
- Voters_Age is TEXT though numeric-valued (Voter.prisma:58);
- Voters_OfficialRegDate stays TEXT while CalculatedRegDate is a
  DATE parsed from MM/dd/yyyy (Voter.prisma:68-69);
- every column except the PK is nullable, and empty strings are NULL
  (load.ts:31-34).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Column name -> Spark type. DATE columns arrive as MM/dd/yyyy text and
# are parsed by sources.tsv; INT columns are cast from text.
VOTER_FIELDS: dict[str, T.DataType] = {
    "LALVOTERID": T.StringType(),  # PK — dedup key on write (Voter.prisma:3)
    "Voters_Active": T.StringType(),
    "Voters_StateVoterID": T.StringType(),
    "Voters_FirstName": T.StringType(),
    "Voters_MiddleName": T.StringType(),
    "Voters_LastName": T.StringType(),
    "Voters_NameSuffix": T.StringType(),
    "Voters_Gender": T.StringType(),
    "Voters_Age": T.StringType(),  # numeric-valued TEXT (Voter.prisma:58)
    "Parties_Description": T.StringType(),
    "Ethnic_Description": T.StringType(),
    "Voters_CalculatedRegDate": T.DateType(),  # MM/dd/yyyy input
    "Voters_OfficialRegDate": T.StringType(),  # date-valued TEXT
    "Residence_Addresses_AddressLine": T.StringType(),
    "Residence_Addresses_City": T.StringType(),
    "Residence_Addresses_Zip": T.StringType(),
    "Residence_Addresses_HouseNumber": T.IntegerType(),
    "Residence_Addresses_Latitude": T.StringType(),  # float-valued TEXT
    "Residence_Addresses_Longitude": T.StringType(),
    "Mailing_Families_FamilyID": T.StringType(),
    "Mailing_Families_HHCount": T.IntegerType(),
    "US_Congressional_District": T.StringType(),
    "County": T.StringType(),
    "General_2022": T.StringType(),
    "General_2020": T.StringType(),
}

# Derived at load time (migration 20240526145650 added it to every
# state table; computed, never read from source TSV).
GEOHASH_COLUMN = "Residence_Addresses_GeoHash"

DATE_FORMAT = "MM/dd/yyyy"


def voter_struct() -> T.StructType:
    """The declared on-disk schema (all nullable except usage of the PK)."""
    return T.StructType(
        [T.StructField(name, dtype, True) for name, dtype in VOTER_FIELDS.items()]
    )


def manifest_struct() -> T.StructType:
    """Load-manifest bookkeeping table (VoterFile.prisma:1-9)."""
    return T.StructType(
        [
            T.StructField("Filename", T.StringType(), False),
            T.StructField("State", T.StringType(), False),
            T.StructField("Lines", T.LongType(), False),
            T.StructField("Loaded", T.BooleanType(), False),
            T.StructField("updatedAt", T.TimestampType(), False),
        ]
    )

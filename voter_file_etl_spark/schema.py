"""Voter schema registry.

One declared schema reused for every state — the reference's 51
generated per-state Prisma models (copy.ts:5-79) collapse into a
single StructType plus a `state` partition column; Spark partition
pruning replaces the per-state table routing (load.ts:140).

Full 339-column model ported mechanically from
prisma/Voter.prisma:3-345 (324 String, 13 Int, 2 DateTime). The
reference's typing quirks are preserved deliberately:

- Latitude/Longitude are TEXT (Voter.prisma:33-34) — cast on use;
- Voters_Age is TEXT though numeric-valued (Voter.prisma:58);
- Voters_OfficialRegDate stays TEXT while CalculatedRegDate is a
  DATE parsed from MM/dd/yyyy (Voter.prisma:68-69);
- Residence_Addresses_GeoHash is declared in the model
  (Voter.prisma:35, migration 20240526145650) but computed at load
  (etl.enrich), never read from source TSV;
- every column except the PK is nullable, and empty strings are NULL
  (load.ts:31-34).
"""

from __future__ import annotations

from pyspark.sql import types as T

_COLUMN_ORDER: tuple[str, ...] = (
    "LALVOTERID", "Voters_Active", "Voters_StateVoterID",
    "Voters_CountyVoterID", "VoterTelephones_LandlineFormatted",
    "VoterTelephones_LandlineConfidenceCode",
    "VoterTelephones_CellPhoneFormatted",
    "VoterTelephones_CellConfidenceCode", "Voters_FirstName",
    "Voters_MiddleName", "Voters_LastName", "Voters_NameSuffix",
    "Residence_Addresses_AddressLine",
    "Residence_Addresses_ExtraAddressLine", "Residence_Addresses_City",
    "Residence_Addresses_State", "Residence_Addresses_Zip",
    "Residence_Addresses_ZipPlus4", "Residence_Addresses_DPBC",
    "Residence_Addresses_CheckDigit", "Residence_Addresses_HouseNumber",
    "Residence_Addresses_PrefixDirection", "Residence_Addresses_StreetName",
    "Residence_Addresses_Designator", "Residence_Addresses_SuffixDirection",
    "Residence_Addresses_ApartmentNum", "Residence_Addresses_ApartmentType",
    "Residence_Addresses_CassErrStatCode", "Voters_SequenceZigZag",
    "Voters_SequenceOddEven", "Residence_Addresses_Latitude",
    "Residence_Addresses_Longitude", "Residence_Addresses_GeoHash",
    "Residence_Addresses_LatLongAccuracy", "Residence_HHParties_Description",
    "Mailing_Addresses_AddressLine", "Mailing_Addresses_ExtraAddressLine",
    "Mailing_Addresses_City", "Mailing_Addresses_State",
    "Mailing_Addresses_Zip", "Mailing_Addresses_ZipPlus4",
    "Mailing_Addresses_DPBC", "Mailing_Addresses_CheckDigit",
    "Mailing_Addresses_HouseNumber", "Mailing_Addresses_PrefixDirection",
    "Mailing_Addresses_StreetName", "Mailing_Addresses_Designator",
    "Mailing_Addresses_SuffixDirection", "Mailing_Addresses_ApartmentNum",
    "Mailing_Addresses_ApartmentType", "Mailing_Addresses_CassErrStatCode",
    "Mailing_Families_FamilyID", "Mailing_Families_HHCount",
    "Mailing_HHGender_Description", "Mailing_HHParties_Description",
    "Voters_Age", "Voters_Gender", "DateConfidence_Description",
    "Parties_Description", "VoterParties_Change_Changed_Party",
    "Ethnic_Description", "EthnicGroups_EthnicGroup1Desc",
    "CountyEthnic_LALEthnicCode", "CountyEthnic_Description",
    "Religions_Description", "Voters_CalculatedRegDate",
    "Voters_OfficialRegDate", "Voters_PlaceOfBirth", "Languages_Description",
    "AbsenteeTypes_Description", "MilitaryStatus_Description",
    "MaritalStatus_Description", "Voters_MovedFrom_State",
    "Voters_MovedFrom_Date", "Voters_MovedFrom_Party_Description",
    "Voters_VotingPerformanceEvenYearGeneral",
    "Voters_VotingPerformanceEvenYearPrimary",
    "Voters_VotingPerformanceEvenYearGeneralAndPrimary",
    "Voters_VotingPerformanceMinorElection", "General_2022", "Primary_2022",
    "OtherElection_2022", "AnyElection_2021", "General_2020", "Primary_2020",
    "PresidentialPrimary_2020", "OtherElection_2020", "AnyElection_2019",
    "General_2018", "Primary_2018", "OtherElection_2018", "AnyElection_2017",
    "General_2016", "Primary_2016", "PresidentialPrimary_2016",
    "OtherElection_2016", "US_Congressional_District",
    "AddressDistricts_Change_Changed_CD", "State_Senate_District",
    "AddressDistricts_Change_Changed_SD", "State_House_District",
    "AddressDistricts_Change_Changed_HD", "State_Legislative_District",
    "AddressDistricts_Change_Changed_LD", "County", "Voters_FIPS",
    "AddressDistricts_Change_Changed_County", "Precinct",
    "County_Legislative_District", "City",
    "City_Council_Commissioner_District", "County_Commissioner_District",
    "County_Supervisorial_District", "City_Mayoral_District",
    "Town_District", "Town_Council", "Village", "Township", "Borough",
    "Hamlet_Community_Area", "City_Ward", "Town_Ward", "Township_Ward",
    "Village_Ward", "Borough_Ward", "Board_of_Education_District",
    "Board_of_Education_SubDistrict", "City_School_District",
    "College_Board_District", "Community_College_Commissioner_District",
    "Community_College_SubDistrict", "County_Board_of_Education_District",
    "County_Board_of_Education_SubDistrict",
    "County_Community_College_District",
    "County_Superintendent_of_Schools_District",
    "County_Unified_School_District", "District_Attorney",
    "Education_Commission_District", "Educational_Service_District",
    "Election_Commissioner_District", "Elementary_School_District",
    "Elementary_School_SubDistrict", "Exempted_Village_School_District",
    "High_School_District", "High_School_SubDistrict",
    "Judicial_Appellate_District", "Judicial_Circuit_Court_District",
    "Judicial_County_Board_of_Review_District",
    "Judicial_County_Court_District", "Judicial_District",
    "Judicial_District_Court_District", "Judicial_Family_Court_District",
    "Judicial_Jury_District", "Judicial_Juvenile_Court_District",
    "Judicial_Magistrate_Division", "Judicial_Sub_Circuit_District",
    "Judicial_Superior_Court_District", "Judicial_Supreme_Court_District",
    "Middle_School_District", "Municipal_Court_District",
    "Proposed_City_Commissioner_District",
    "Proposed_Elementary_School_District",
    "Proposed_Unified_School_District",
    "Regional_Office_of_Education_District", "School_Board_District",
    "School_District", "School_District_Vocational",
    "School_Facilities_Improvement_District", "School_Subdistrict",
    "Service_Area_District", "Superintendent_of_Schools_District",
    "Unified_School_District", "Unified_School_SubDistrict",
    "Coast_Water_District", "Consolidated_Water_District",
    "County_Water_District", "County_Water_Landowner_District",
    "County_Water_SubDistrict", "Metropolitan_Water_District",
    "Mountain_Water_District", "Municipal_Water_District",
    "Municipal_Water_SubDistrict", "River_Water_District", "Water_Agency",
    "Water_Agency_SubDistrict", "Water_Conservation_District",
    "Water_Conservation_SubDistrict", "Water_Control__Water_Conservation",
    "Water_Control__Water_Conservation_SubDistrict", "Water_District",
    "Water_Public_Utility_District", "Water_Public_Utility_Subdistrict",
    "Water_Replacement_District", "Water_Replacement_SubDistrict",
    "Water_SubDistrict", "County_Fire_District", "Fire_District",
    "Fire_Maintenance_District", "Fire_Protection_District",
    "Fire_Protection_SubDistrict", "Fire_Protection_Tax_Measure_District",
    "Fire_Service_Area_District", "Fire_SubDistrict",
    "Independent_Fire_District", "Proposed_Fire_District",
    "Unprotected_Fire_District", "Bay_Area_Rapid_Transit",
    "Metro_Transit_District", "Rapid_Transit_District",
    "Rapid_Transit_SubDistrict", "Transit_District", "Transit_SubDistrict",
    "Community_Service_District", "Community_Service_SubDistrict",
    "County_Service_Area", "County_Service_Area_SubDistrict",
    "TriCity_Service_District", "Library_Services_District",
    "Airport_District", "Annexation_District", "Aquatic_Center_District",
    "Aquatic_District", "Assessment_District", "Bonds_District",
    "Career_Center", "Cemetery_District", "Central_Committee_District",
    "Chemical_Control_District", "Committee_Super_District",
    "Communications_District", "Community_College_At_Large",
    "Community_Council_District", "Community_Council_SubDistrict",
    "Community_Facilities_District", "Community_Facilities_SubDistrict",
    "Community_Hospital_District", "Community_Planning_Area",
    "Congressional_Township", "Conservation_District",
    "Conservation_SubDistrict", "Control_Zone_District",
    "Corrections_District", "County_Hospital_District",
    "County_Library_District", "County_Memorial_District",
    "County_Paramedic_District", "County_Sewer_District",
    "Democratic_Convention_Member", "Democratic_Zone",
    "Designated_Market_Area_DMA", "Drainage_District",
    "Educational_Service_Subdistrict",
    "Emergency_Communication_911_District",
    "Emergency_Communication_911_SubDistrict", "Enterprise_Zone_District",
    "EXT_District", "Facilities_Improvement_District", "Flood_Control_Zone",
    "Forest_Preserve", "Garbage_District",
    "Geological_Hazard_Abatement_District", "Health_District",
    "Hospital_SubDistrict", "Improvement_Landowner_District",
    "Irrigation_District", "Irrigation_SubDistrict", "Island",
    "Land_Commission", "Landscaping_And_Lighting_Assessment_Distric",
    "Law_Enforcement_District",
    "Learning_Community_Coordinating_Council_District", "Levee_District",
    "Levee_Reconstruction_Assesment_District", "Library_District",
    "Library_SubDistrict", "Lighting_District", "Local_Hospital_District",
    "Local_Park_District", "Maintenance_District", "Master_Plan_District",
    "Memorial_District", "Metro_Service_District",
    "Metro_Service_Subdistrict", "Mosquito_Abatement_District",
    "Multi_township_Assessor", "Municipal_Advisory_Council_District",
    "Municipal_Utility_District", "Municipal_Utility_SubDistrict",
    "Museum_District", "Northeast_Soil_and_Water_District",
    "Open_Space_District", "Open_Space_SubDistrict", "Other",
    "Paramedic_District", "Park_Commissioner_District", "Park_District",
    "Park_SubDistrict", "Planning_Area_District", "Police_District",
    "Port_District", "Port_SubDistrict", "Power_District", "Proposed_City",
    "Proposed_Community_College", "Proposed_District",
    "Public_Airport_District", "Public_Regulation_Commission",
    "Public_Service_Commission_District", "Public_Utility_District",
    "Public_Utility_SubDistrict", "Reclamation_District",
    "Recreation_District", "Recreational_SubDistrict", "Republican_Area",
    "Republican_Convention_Member", "Resort_Improvement_District",
    "Resource_Conservation_District", "Road_Maintenance_District",
    "Rural_Service_District", "Sanitary_District", "Sanitary_SubDistrict",
    "Sewer_District", "Sewer_Maintenance_District", "Sewer_SubDistrict",
    "Snow_Removal_District", "Soil_And_Water_District",
    "Soil_And_Water_District_At_Large", "Special_Reporting_District",
    "Special_Tax_District", "Storm_Water_District",
    "Street_Lighting_District", "TV_Translator_District",
    "Unincorporated_District", "Unincorporated_Park_District",
    "Ute_Creek_Soil_District", "Vector_Control_District",
    "Vote_By_Mail_Area", "Wastewater_District", "Weed_District",
)

_INT_COLUMNS = frozenset((
    "VoterTelephones_LandlineConfidenceCode",
    "VoterTelephones_CellConfidenceCode", "Residence_Addresses_State",
    "Residence_Addresses_CheckDigit", "Residence_Addresses_HouseNumber",
    "Residence_Addresses_PrefixDirection",
    "Residence_Addresses_SuffixDirection", "Mailing_Addresses_State",
    "Mailing_Addresses_CheckDigit", "Mailing_Addresses_PrefixDirection",
    "Mailing_Addresses_SuffixDirection", "Mailing_Families_HHCount",
    "Voters_MovedFrom_State",
))

_DATE_COLUMNS = frozenset((
    "Voters_CalculatedRegDate", "Voters_MovedFrom_Date",
))


def _dtype(name: str) -> T.DataType:
    if name in _INT_COLUMNS:
        return T.IntegerType()
    if name in _DATE_COLUMNS:
        return T.DateType()
    return T.StringType()


# Column name -> Spark type, in Voter.prisma declaration order. DATE
# columns arrive as MM/dd/yyyy text and are parsed by sources.tsv;
# INT columns are try_cast from text.
VOTER_FIELDS: dict[str, T.DataType] = {n: _dtype(n) for n in _COLUMN_ORDER}

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

from supabase_etl_spark.functions.nulls import nan_to_null, truthy_coalesce
from supabase_etl_spark.functions.packing import (
    discover_column_ci,
    exclusion_project,
    pack_json,
    pack_map,
    to_jsonb_records,
)

__all__ = [
    "nan_to_null",
    "truthy_coalesce",
    "discover_column_ci",
    "exclusion_project",
    "pack_json",
    "pack_map",
    "to_jsonb_records",
]

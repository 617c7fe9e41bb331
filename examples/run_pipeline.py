#!/usr/bin/env python
"""Runnable demo: the full ingest chain over the shipped example
config (examples/practice_config.json) with generated sample data.

    python examples/run_pipeline.py

Creates a temp inbound directory with one appointment CSV (plus one
deliberately broken file to show precheck rejection), runs
precheck -> RAW -> REFINED -> CURATED with medallion-zone tables, and
prints the run report, the curated rows, and the audit logs.
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ulh_etl_spark.config import load_config
from ulh_etl_spark.pipeline import run_practice
from ulh_etl_spark.session import get_spark
from ulh_etl_spark.sinks.tables import write_table

CSV_HEADER = (
    "appt_id,Appt_Date,Appt_Provider,Appt_StartTime,Appt_Status,Appt_Type,"
    "national_provider_id,location_id,location_name,Patient_Address_1,"
    "cell_phone,city,email_address,state,zip,Primary_Ins_Name,"
    "Primary_Policy_Number,date_of_birth,first_name,last_name,med_rec_nbr,"
    "Appointment_Deleted"
)

ROWS = [
    "{A-1},2099-03-01,Dr. Who,09:00,RESCHEDULED,Checkup,1234,{L-1},Alpha Clinic,"
    "1 Main St,555,Springfield,a@b.c,IL,62704,Medicare,1AB2CD3EF45,"
    "1950-01-01,Alice,Smith,M1,N",
    "{A-2},2099-03-02,Dr. Who,10:00,Scheduled,Checkup,1234,{L-1},Beta Center,"
    "1 Main St,555,Springfield,a@b.c,IL,62704,Medicare,,"
    "1950-01-01,Bob,Jones,M2,N",
]


def main() -> None:
    spark = get_spark("example-pipeline")
    inbound = Path(tempfile.mkdtemp(prefix="ulh_inbound_"))
    (inbound / "adcs_appts.csv").write_text(CSV_HEADER + "\n" + "\n".join(ROWS) + "\n")
    (inbound / "broken.csv").write_text("wrong,header\n1\n")

    cfg_dict = json.load(open(Path(__file__).parent / "practice_config.json"))
    cfg_dict["Practices"][0]["ingest"][0]["source"]["directory"] = str(inbound)
    write_table(
        spark.createDataFrame(
            [("Alpha", "Office Alpha")], "emr_location string, assigned_office string"
        ),
        "office_mappings", mode="overwrite",
    )

    reports = run_practice(
        spark, load_config(cfg_dict), "adcs", archive=True, use_zones=True,
        notify=lambda kind, payload: print(f"  [notify] {kind}: {payload}"),
    )
    for rpt in reports:
        print(f"\nrun {rpt.parent_run_id} -> {rpt.status}")
        print(f"  loaded:   {rpt.files_loaded}")
        print(f"  rejected: {rpt.files_rejected}")
        print(f"  rows raw/refined/curated: "
              f"{rpt.rows_raw}/{rpt.rows_refined}/{rpt.rows_curated}")
        print(f"  record types: {rpt.record_type_distribution}")

    print("\ncurated rows:")
    spark.table("curated_zone.adcs_appointmentdata").show(truncate=False)
    print("audit trail:")
    for stage in ("precheck", "raw", "refined", "curated"):
        spark.table(f"{stage}_ingest_log").select(
            "stage", "entry", "status", "rows_written", "error_message"
        ).show(truncate=60)


if __name__ == "__main__":
    main()

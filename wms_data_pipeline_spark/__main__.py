"""CLI — mirrors the reference's service entry points so a user of the
reference can run the same two commands against this engine:

  python -m wms_data_pipeline_spark extract \
      --base-url http://wms-api:8000 --landing-root /data/landing \
      --control-root /data/control [--entities ib_receipts,ob_orders] \
      [--lookback-seconds 120] [--limit 500] [--format parquet]

  python -m wms_data_pipeline_spark stage \
      --entity ib_receipts --run-id <hex> --landing-root /data/landing \
      --warehouse-root /data/warehouse

(reference: services/extractor/app/run.py, services/staging/app/run.py:20-25
— entity choices pinned, run_id required and forwarded by the orchestrator.)
"""

from __future__ import annotations

import argparse
import sys

from wms_data_pipeline_spark.schemas import ENTITY_RAW_SCHEMAS
from wms_data_pipeline_spark.session import get_spark

ENTITIES = sorted(ENTITY_RAW_SCHEMAS)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="wms_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ext = sub.add_parser("extract", help="incremental fetch → landing → watermark")
    ext.add_argument("--base-url", required=True)
    ext.add_argument("--landing-root", required=True)
    ext.add_argument("--control-root", required=True)
    ext.add_argument("--entities", default=",".join(ENTITIES))
    ext.add_argument("--lookback-seconds", type=int, default=120)
    ext.add_argument("--limit", type=int, default=500)
    ext.add_argument("--format", default="parquet", choices=["parquet", "csv"])

    stg = sub.add_parser("stage", help="landing → history + latest merges → run log")
    stg.add_argument("--entity", required=True, choices=ENTITIES)
    stg.add_argument("--run-id", required=True)
    stg.add_argument("--landing-root", required=True)
    stg.add_argument("--warehouse-root", required=True)

    orch = sub.add_parser(
        "run",
        help="orchestrated extract → stage for every entity (the DAG analogue: "
        "one extract run, run_id forwarded to per-entity staging)",
    )
    orch.add_argument("--base-url", required=True)
    orch.add_argument("--landing-root", required=True)
    orch.add_argument("--control-root", required=True)
    orch.add_argument("--warehouse-root", required=True)
    orch.add_argument("--entities", default=",".join(ENTITIES))
    orch.add_argument("--lookback-seconds", type=int, default=120)
    orch.add_argument("--limit", type=int, default=500)
    orch.add_argument("--partitioned", action="store_true")

    args = p.parse_args(argv)
    spark = get_spark(f"wms-{args.cmd}")
    try:
        if args.cmd == "extract":
            from wms_data_pipeline_spark.pipeline import extractor_run

            results = extractor_run(
                spark,
                args.base_url,
                [e.strip() for e in args.entities.split(",") if e.strip()],
                args.landing_root,
                args.control_root,
                lookback_seconds=args.lookback_seconds,
                limit=args.limit,
                output_format=args.format,
            )
            for r in results:
                print(
                    f"entity={r.entity} run_id={r.run_id} rows={r.rows} "
                    f"landing={r.landing_path} new_watermark={r.new_watermark.isoformat()}"
                )
            return 0
        elif args.cmd == "run":
            from wms_data_pipeline_spark.pipeline import orchestrated_run

            pairs = orchestrated_run(
                spark,
                args.base_url,
                args.landing_root,
                args.control_root,
                args.warehouse_root,
                entities=[e.strip() for e in args.entities.split(",") if e.strip()],
                partitioned=args.partitioned,
                lookback_seconds=args.lookback_seconds,
                limit=args.limit,
            )
            rc = 0
            for ex, st in pairs:
                status = "skipped(no rows)" if st is None else st.status
                print(
                    f"entity={ex.entity} run_id={ex.run_id} extracted={ex.rows} "
                    f"staged={status}"
                    + (
                        f" inserted_history={st.inserted_history} "
                        f"upserted_latest={st.upserted_latest}"
                        if st is not None
                        else ""
                    )
                )
                if st is not None and st.status != "success":
                    rc = 1
            return rc
        else:
            from wms_data_pipeline_spark.pipeline import staging_run

            res = staging_run(
                spark, args.landing_root, args.warehouse_root, args.entity, args.run_id
            )
            print(
                f"entity={res.entity} run_id={res.run_id} status={res.status} "
                f"rows_in={res.rows_in} inserted_history={res.inserted_history} "
                f"upserted_latest={res.upserted_latest}"
                + (f" error={res.error}" if res.error else "")
            )
            return 0 if res.status == "success" else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())

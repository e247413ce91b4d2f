# Container image for the engine: PySpark 4 on Java 17, package on
# PYTHONPATH, driven by `python -m wms_data_pipeline_spark ...` (the two
# reference services as subcommands — see RUNBOOK §1) or spark-submit on a
# real cluster. Deployment parity with the reference's image (it ships an
# Airflow image; here the scheduler is the compose `scheduler` service —
# see docker-compose.yaml and RUNBOOK §7).
#
# NOTE: this sandbox has no Docker daemon; the image builds from public
# images/packages only and is exercised via the compose file in a real
# environment.

FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
 && apt-get install -y --no-install-recommends python3 python3-pip tini \
 && rm -rf /var/lib/apt/lists/* \
 && ln -sf /usr/bin/python3 /usr/bin/python

# The engine's only hard deps; versions match the tested environment.
RUN pip install --no-cache-dir \
    "pyspark==4.1.2" "pyarrow>=15" "pandas>=2.1" "numpy>=1.26"

WORKDIR /opt/engine
COPY wms_data_pipeline_spark/ wms_data_pipeline_spark/
COPY tools/ tools/
COPY RUNBOOK.md .

ENV PYTHONPATH=/opt/engine \
    PYTHONUNBUFFERED=1 \
    # local mode by default; compose/spark-submit override for clusters
    SPARK_MASTER=local[*]

ENTRYPOINT ["/usr/bin/tini", "--"]
CMD ["python", "-m", "wms_data_pipeline_spark", "--help"]

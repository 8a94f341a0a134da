# Container parity with the reference's batch-bootstrapper/Dockerfile
# (python:3.9-ish slim + pipenv + CMD batch_bootstrapper.py). Same
# lifecycle: the container runs one bootstrap + incremental CDC pass and
# exits; schedule it (cron / k8s CronJob / Airflow) to poll for new files.
# For a real cluster, base on an image with a matching Spark distribution
# and submit via spark-submit instead of local[*].
FROM python:3.12-slim

# Spark needs a JVM; pyspark ships its own Spark jars.
RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

WORKDIR /app
COPY pyproject.toml README.md ./
COPY tabular_cdc_bootstrapper_spark ./tabular_cdc_bootstrapper_spark
# pillow: the full-pixel image codec tier for functions/multimodal.py
# (decode_image_real); without it the stdlib header-parse tier still
# covers PNG/JPEG/GIF dimensions and the deterministic stub covers
# feature extraction.
RUN pip install --no-cache-dir . pillow

# Config is env-driven, mirroring the reference's TABULAR_* variables
# (see config.py): TABULAR_BUCKET_NAME, TABULAR_BUCKET_MONITOR_PATH,
# TABULAR_CDC_ID_FIELD, TABULAR_CDC_TIMESTAMP_FIELD, SPARK_CDC_SOURCE_DIR.
CMD ["python", "-m", "tabular_cdc_bootstrapper_spark"]

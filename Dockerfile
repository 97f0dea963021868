# cdc2vec_spark engine image.
#
# Mirrors the reference's two-stage Dockerfile intent
# (/root/reference/Dockerfile:1 — small runtime, binary + offsets dir,
# health port 8080) for a PySpark runtime: one stage, because the
# "build" here is a pip install, and the JVM can't be stripped anyway.
#
# Build:  docker build -t cdc2vec-spark .
# Run:    docker run -e CONFIG_PATH=/app/configs/postgres-qdrant.yaml \
#             -p 8080:8080 cdc2vec-spark

FROM python:3.12-slim

# Spark needs a JRE; headless 17 matches the engine's tested runtime.
# procps supplies `ps`, which Spark's launch scripts shell out to.
RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless procps \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

WORKDIR /app

COPY requirements.txt ./
RUN pip install --no-cache-dir -r requirements.txt

COPY cdc2vec_spark ./cdc2vec_spark
COPY configs ./configs
COPY scripts/docker-entrypoint.sh /usr/local/bin/docker-entrypoint.sh
RUN chmod +x /usr/local/bin/docker-entrypoint.sh

# engine working directory (chunks / state / checkpoints / wal tail) —
# the analogue of the reference's /data/offsets
RUN mkdir -p /data/work
VOLUME /data

# /healthz + /metrics (streaming/health.py), same port as the reference
EXPOSE 8080

ENV CONFIG_PATH=/app/configs/postgres-qdrant.yaml
ENTRYPOINT ["docker-entrypoint.sh"]

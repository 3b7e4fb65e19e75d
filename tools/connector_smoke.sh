#!/usr/bin/env bash
# Reproducible live-connector smoke (VERDICT r11 item 5): stand up MSSQL +
# Azurite containers, run the env-gated smokes in tests/test_connector_smoke.py
# against them, and record the result log under tools/connector_smoke_last.log.
#
# The smokes drive the two reference behaviors that otherwise run only against
# stand-ins (sqlite JDBC / local FS): the SQL Server pushdown-subquery read
# (reference ApplaudoETL.scala:110-127) and the wasb:// SAS-configured parquet
# round-trip (reference ApplaudoETL.scala:33,77-86).
#
# Requirements (why this cannot run inside the build sandbox, which has no
# docker daemon and no network):
#   - a reachable docker daemon
#   - network access to pull the two images + the three jars below
#
# Usage: tools/connector_smoke.sh [jar-dir]
#   jar-dir must contain:
#     mssql-jdbc-12.*.jre11.jar        (Microsoft JDBC driver)
#     hadoop-azure-<hadoop-ver>.jar    (match the pyspark Hadoop version)
#     azure-storage-8.6.6.jar          (wasb:// SDK for hadoop-azure)
set -euo pipefail

JAR_DIR="${1:-/opt/connector-jars}"
LOG="$(dirname "$0")/connector_smoke_last.log"
MSSQL_PASSWORD='Str0ng!Passw0rd'

if ! docker info >/dev/null 2>&1; then
    echo "connector-smoke: no reachable docker daemon — run on a docker host" >&2
    exit 2
fi

MSSQL_JAR=$(ls "$JAR_DIR"/mssql-jdbc-*.jar 2>/dev/null | head -1 || true)
AZ_JARS=$(ls "$JAR_DIR"/hadoop-azure-*.jar "$JAR_DIR"/azure-storage-*.jar 2>/dev/null \
          | paste -sd: - || true)
if [[ -z "$MSSQL_JAR" || -z "$AZ_JARS" ]]; then
    echo "connector-smoke: missing jars under $JAR_DIR (see header)" >&2
    exit 2
fi

cleanup() {
    docker rm -f smoke-mssql smoke-azurite >/dev/null 2>&1 || true
}
trap cleanup EXIT

docker run -d --name smoke-mssql -p 1433:1433 -e ACCEPT_EULA=Y \
    -e MSSQL_SA_PASSWORD="$MSSQL_PASSWORD" \
    mcr.microsoft.com/mssql/server:2022-latest >/dev/null
docker run -d --name smoke-azurite -p 10000:10000 \
    mcr.microsoft.com/azure-storage/azurite >/dev/null

# MSSQL needs ~20-60 s to accept logins; poll rather than sleep blind
for i in $(seq 1 60); do
    if docker exec smoke-mssql /opt/mssql-tools18/bin/sqlcmd -C -S localhost \
        -U sa -P "$MSSQL_PASSWORD" -Q "SELECT 1" >/dev/null 2>&1; then
        break
    fi
    sleep 2
    [[ $i == 60 ]] && { echo "MSSQL never came up" >&2; exit 1; }
done

export SPARK_GRAFT_MSSQL_URL='jdbc:sqlserver://localhost:1433;databaseName=master;encrypt=false'
export SPARK_GRAFT_MSSQL_USER=sa
export SPARK_GRAFT_MSSQL_PASSWORD="$MSSQL_PASSWORD"
export SPARK_GRAFT_MSSQL_JAR="$MSSQL_JAR"
export SPARK_GRAFT_AZURE_JARS="$AZ_JARS"
export SPARK_GRAFT_AZURITE=1

{
    echo "connector-smoke run: $(date -u +%Y-%m-%dT%H:%M:%SZ) @ $(git -C "$(dirname "$0")/.." rev-parse --short HEAD)"
    python -m pytest "$(dirname "$0")/../tests/test_connector_smoke.py" -v -rs
} 2>&1 | tee "$LOG"
echo "recorded: $LOG"

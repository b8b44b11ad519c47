#!/bin/bash
# One standalone-JVM run of the Bench CPU probe (graft.tools.CpuProbe).
# Recalibration protocol: quiet box, four sequential invocations, all
# samples within a few percent — see CpuProbe.scala + BENCHLOG.md.
set -euo pipefail
cd "$(dirname "$0")/.."
exec java -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.tools.CpuProbe

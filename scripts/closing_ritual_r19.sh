#!/bin/bash
# Round-19 closing ritual, in the governed order (PERFNOTES r19 rule):
# full Bench board -> StageAudit sf0.1 -> StageAudit 10x -> smokes.
cd /root/repo
echo "ritual start $(date -u +%H:%M:%S)" > /tmp/ritual_r19.status
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" > /tmp/bench_r19.log 2>&1
echo "BENCH_RC=$? $(date -u +%H:%M:%S)" >> /tmp/ritual_r19.status
sbt -batch "runMain graft.tools.StageAudit /root/testdata/sf0.1 2.0" > /tmp/audit_sf01_r19.log 2>&1
echo "AUDIT_SF01_RC=$? $(date -u +%H:%M:%S)" >> /tmp/ritual_r19.status
sbt -batch "runMain graft.tools.StageAudit 10x 6.0" > /tmp/audit_10x_r19.log 2>&1
echo "AUDIT_10X_RC=$? $(date -u +%H:%M:%S)" >> /tmp/ritual_r19.status
sbt -batch "runMain graft.tools.ScaleSmoke" > /tmp/scalesmoke_r19.log 2>&1
echo "SCALESMOKE_RC=$? $(date -u +%H:%M:%S)" >> /tmp/ritual_r19.status
sbt -batch "runMain graft.tools.PipelineScaleSmoke" > /tmp/pipesmoke_r19.log 2>&1
echo "PIPESMOKE_RC=$? $(date -u +%H:%M:%S)" >> /tmp/ritual_r19.status
echo "ritual done $(date -u +%H:%M:%S)" >> /tmp/ritual_r19.status

#!/bin/sh
# Non-oracle 10x scale probe: generates target/sf1 (hash-deterministic;
# see graft.ScaleProbe) and times the graph/ANN/planner families at
# sf0.1 vs sf1. Emits one {"metric":"scale_probe",...} JSON line.
# Linear-in-input operators should land near ratio ~10 for scan-bound
# legs; interpret ratios together with the emitted cardinalities.
cd "$(dirname "$0")/.." || exit 1
exec sbt -batch "runMain graft.ScaleProbe"

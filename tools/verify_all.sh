#!/bin/sh
# Full verification pyramid, in increasing cost order. Any failure stops.
#   1. pytest          — unit/invariant/plan-shape/streaming suites
#   2. plan_audit      — whole-catalog physical-plan lint
#   3. check_oracle    — every catalog query vs its DuckDB oracle (sf0.01)
#   4. driver_harness  — foreign-cwd, driver-style end-to-end (all queries)
#   5. bench           — sf0.1 headline timings (informational)
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/plan_audit.py
python tools/check_oracle.py
( cd /tmp && python "$OLDPWD"/tools/driver_harness.py --all )
python bench.py

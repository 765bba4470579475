# Per-round invariants — run ALL of these before calling a round done.
# (VERDICT r5: the full-catalog oracle artifact is the only complete
# correctness gate; the driver's CORRECTNESS window rotates and can
# miss a broken query entirely.)

ROUND ?= rX
SF_SMALL ?= /root/testdata/sf0.001
SF_ORACLE ?= /root/testdata/sf0.01

.PHONY: test oracle-full bench canary all

all: canary test oracle-full bench

# seconds-fast environment-drift canary: run FIRST every round
canary:
	python -m pytest tests/test_env_canary.py -q

test:
	python -m pytest tests/ -q

# full-catalog cross-engine gate (all 82 queries, ~5 min at sf0.01);
# commit the artifact: make oracle-full ROUND=r6
oracle-full:
	python tools/check_oracle.py --json ORACLE_FULL_$(ROUND).json $(SF_ORACLE)

bench:
	python bench.py

# ics_tpu — convenience targets. The two verify-* targets are one-command
# rehearsals for the environment-blocked validations (VERDICT r3): run them
# in the first environment that has docker / egress and each closes its gap
# in minutes; here they degrade to a one-line SKIP. See docs/operacao.md.

.PHONY: test bench native verify-pg verify-weights

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C ics_tpu/native libimgcodec.so

# Live-PostgreSQL validation: compose up postgres:15, run the -m postgres
# wire-client tests (SCRAM, OIDs, tx recovery) then the whole suite on PG.
verify-pg:
	bash scripts/verify_pg.sh

# Real-pretrained-weights validation: download (or find) one torchvision
# checkpoint per family, import via train/pretrained.py, assert our folded
# bf16 forward matches torchvision's reference forward.
verify-weights:
	python scripts/verify_weights.py

# Common workflows. PYTHONPATH must retain the TPU plugin path in this
# environment; adjust AXON for standard installs.
AXON ?= /root/.axon_site
PY   := PYTHONPATH=.:$(AXON) python3

.PHONY: test test-all bench demo train rollout samples physics

physics:
	$(PY) scripts/physics_gate.py --out PHYSICS_r03.json

test:
	$(PY) -m pytest tests/ -x -q

# Includes the quarantined goldens for superseded kernel generations
# (flash/fused/fused_packed/mega-axial) and the slow physics gate.
test-all:
	$(PY) -m pytest tests/ -x -q -m ""

bench:
	$(PY) bench.py --batch 4 --size 512

samples:
	$(PY) scripts/make_sample_data.py --out samples/ --n 3 --frames 200 --size 64

demo: samples
	BUBBLEML_SAMPLES=samples $(PY) scripts/train.py data_cfg=samples_smoke \
	  model_cfg=avit_tiny optim_cfg=adamw max_epochs=4 batch_size=8 \
	  limit_train_batches=50 limit_val_batches=5 log_dir=demo_logs use_wandb=false

train:
	$(PY) scripts/train.py max_epochs=400 batch_size=8 \
	  data_cfg=poolboiling_saturated model_cfg=avit_big optim_cfg=adamw

rollout:
	$(PY) scripts/inference.py --ckpt demo_logs/avit_samples_smoke_local/last \
	  --data samples/sample_2.hdf5 --model-cfg avit_tiny --data-cfg samples_smoke \
	  --steps 50 --start-time 5 --save-dir rollout_out --plot

#!/usr/bin/env bash
# Reference parity example (reference: train.sh)
python train.py --config configs/crnn_mrn.py

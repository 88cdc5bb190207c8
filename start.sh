#!/bin/bash
# Launcher parity with the reference (reference: start.sh:3-9), with the
# config overridable from the command line.

config="${1:-configs/prompts/SampleConfigIPAdapter.yaml}"

echo "Running ${config} ..."

export PYTHONPATH="${PYTHONPATH}:./"

python main.py --config "${config}"

"""Pallas TPU kernels for the hot ops.

detect.py fuses the entire Schmidl-Cox scan (sliding window sums, metric,
first-peak commit) into one VMEM-resident pass per stream. XLA equivalents
in sync.py remain the portable/reference path; kernels are selected on TPU.
"""

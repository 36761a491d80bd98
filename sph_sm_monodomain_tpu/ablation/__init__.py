"""Superseded implementations kept as the measured-rejection /ablation
record (VERDICT r4 item 8). Nothing in the production package imports this
subpackage; tools/ablate_fused.py and the legacy regression tests do."""

"""CLI entry points mirroring the reference's public surface.

python -m radarml_tpu.apps.train / predict / ground_truth_samples /
visualize / dnn / sgan — flags follow the reference scripts
(SURVEY.md C33) with documented hardware-free extras.
"""

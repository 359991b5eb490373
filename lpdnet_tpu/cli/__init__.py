"""Console entry points (reference L3 drivers — SURVEY §1).

Installed as ``lpdnet-train`` / ``lpdnet-evaluate`` (pyproject
``[project.scripts]``); the repo-root ``train.py`` / ``evaluate.py`` shims
keep the reference-style ``python train.py ...`` invocation working from a
checkout.
"""

"""Per-partition lineage manifests + resume planning (the Ray-native
replacement for the reference's skip-if-output-exists / CheckPointer /
GNU-parallel ``--resume`` machinery, SURVEY.md §2.3 T4-T5, §4).
"""

from .manifest import Manifest  # noqa: F401

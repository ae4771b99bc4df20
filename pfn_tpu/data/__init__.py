"""Real-data loaders (host-side): tabular benchmark + Omniglot class banks."""

from pfn_tpu.data.omniglot import (
    ClassBank,
    load_omniglot_class_bank,
    synthetic_class_bank,
)
from pfn_tpu.data.datasets import (
    class_balance_interleave,
    get_breast_cancer,
    get_2class_iris,
    get_2class_wine,
    get_iris,
    get_wine,
    get_diabetes,
    get_linnerud,
    load_local_benchmark,
    load_openml_list,
    load_reference_benchmark,
    load_svmlight,
    get_csv_labeled,
    valid_dids_classification,
    test_dids_classification,
)

__all__ = [
    "ClassBank",
    "load_omniglot_class_bank",
    "synthetic_class_bank",
    "class_balance_interleave",
    "get_breast_cancer",
    "get_2class_iris",
    "get_2class_wine",
    "get_iris",
    "get_wine",
    "get_diabetes",
    "get_linnerud",
    "load_local_benchmark",
    "load_openml_list",
    "load_reference_benchmark",
    "load_svmlight",
    "get_csv_labeled",
    "valid_dids_classification",
    "test_dids_classification",
]

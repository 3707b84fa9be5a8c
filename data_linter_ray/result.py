"""ValidatorResult — nested-dict verdict model.

Shape-compatible with the reference's response object
(``/root/reference/data_linter/validators/base.py:9-103``):

    {
      "valid": bool,                     # AND-fold of everything below
      "<col>": {
        "valid": bool,                   # AND-fold of this column's tests
        "<test>": {
          "valid": bool,
          "test_inputs": {...},
          # present only when the test failed:
          "percentage_of_column_is_error": float,
          "unexpected_index_sample": [...],   # here: doc refs, not pandas idx
          "unexpected_values_sample": [...],  # stringified values
        },
      },
      "validator-table-test-...": {...}   # table-level pseudo-columns
    }

Built from the aggregated verdict rows produced by the Ray pipeline —
never from driver-side collection of full violation data.
"""

from __future__ import annotations

from copy import deepcopy
from typing import List


class ValidatorResult:
    """Accumulates per-column per-test results into the nested verdict dict."""

    TABLE_TEST_PREFIX = "validator-table-test-"

    def __init__(self, result_dict: dict | None = None, validator_valid_key_name: str = "valid"):
        self.result: dict = result_dict if result_dict is not None else {"valid": True}
        self.vvkn = validator_valid_key_name

    def get_result(self, copy: bool = True) -> dict:
        return deepcopy(self.result) if copy else self.result

    @property
    def metadata(self) -> dict:
        """Attached table schema dict (reference base.py:29-48 parity —
        our TableSchema stands in for mojap Metadata; validated on set)."""
        return self._metadata

    @metadata.setter
    def metadata(self, meta_dict: dict) -> None:
        from data_linter_ray.metadata import TableSchema

        self._metadata = TableSchema.from_dict(meta_dict).to_dict()

    def init_col(self, colname: str) -> None:
        if colname not in self.result:
            self.result[colname] = {"valid": True}

    def add_test_to_col(self, colname: str, testname: str, test_result: dict) -> None:
        self.init_col(colname)
        self.result[colname][testname] = test_result
        if self.vvkn in test_result:
            ok = test_result[self.vvkn]
            self.result["valid"] = self.result["valid"] and ok
            self.result[colname]["valid"] = self.result[colname]["valid"] and ok

    def add_table_test(self, testname: str, test_result: dict) -> None:
        """Table-level tests are stored under a pseudo-column key
        (reference base.py:87-94 stores them under the raw testname; the
        get_names_of_column_failures filter skips keys with the
        table-test prefix, so we use the prefixed form consistently)."""
        key = testname if testname.startswith(self.TABLE_TEST_PREFIX) else testname
        self.result[key] = test_result
        if self.vvkn in test_result:
            self.result["valid"] = self.result["valid"] and test_result[self.vvkn]

    @property
    def valid(self) -> bool:
        return self.result["valid"]

    def get_names_of_column_failures(self, test_names: List[str] | None = None) -> list[str]:
        """Columns with an overall (or per-listed-test) failure
        (reference base.py:62-85)."""
        test_names = test_names or []
        failed = []
        for colname, v in self.result.items():
            if colname == "valid" or colname.startswith(self.TABLE_TEST_PREFIX):
                continue
            if not isinstance(v, dict):
                continue
            if test_names:
                ok = True
                for k, t in v.items():
                    if k in test_names and isinstance(t, dict):
                        ok = ok and t.get(self.vvkn, True)
            else:
                ok = v.get("valid", True)
            if not ok:
                failed.append(colname)
        return failed

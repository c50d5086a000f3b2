"""Index-routing truth-table tests.

Modeled on the reference's exhaustive IndexCollection asserts
(``tests/data_indices/test_collection.py:20-139``).
"""

import numpy as np
import pytest

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.utils import DotDict


@pytest.fixture
def data_indices():
    config = DotDict(
        {
            "data": {
                "forcing": ["x"],
                "diagnostic": ["z", "q"],
                "remapped": {"d": ["cos_d", "sin_d"]},
            }
        }
    )
    name_to_index = {"x": 0, "y": 1, "z": 2, "q": 3, "e": 4, "d": 5, "other": 6}
    return IndexCollection(config=config, name_to_index=name_to_index)


def test_dataindex_init(data_indices):
    assert data_indices.data.input.includes == ["x"]
    assert data_indices.data.input.excludes == ["z", "q"]
    assert data_indices.internal_data.input.includes == ["x"]
    assert data_indices.internal_data.input.excludes == ["z", "q"]


def test_dataindex_max(data_indices):
    assert max(data_indices.data.input.full) == 6
    assert max(data_indices.data.output.full) == 6
    # internal data: d dropped, cos_d/sin_d appended -> 8 variables, max idx 7
    assert max(data_indices.internal_data.input.full) == 7
    assert max(data_indices.internal_data.output.full) == 7


def test_modelindex(data_indices):
    # model input drops diagnostics z,q -> x,y,e,d,other
    assert len(data_indices.model.input.full) == 5
    # model output drops forcing x -> y,z,q,e,d,other
    assert len(data_indices.model.output.full) == 6
    # internal model input: x,y,e,other + cos_d,sin_d
    assert len(data_indices.internal_model.input.full) == 6
    # internal model output: y,z,q,e,other + cos_d,sin_d
    assert len(data_indices.internal_model.output.full) == 7


def test_prognostic(data_indices):
    # prognostic at data level: y, e, d, other
    np.testing.assert_array_equal(data_indices.data.input.prognostic, [1, 4, 5, 6])
    np.testing.assert_array_equal(data_indices.data.output.prognostic, [1, 4, 5, 6])
    # internal: y, e, other, cos_d, sin_d
    assert len(data_indices.internal_data.input.prognostic) == 5
    assert len(data_indices.internal_model.input.prognostic) == len(
        data_indices.internal_model.output.prognostic
    )


def test_forcing_diagnostic(data_indices):
    np.testing.assert_array_equal(data_indices.data.input.forcing, [0])
    np.testing.assert_array_equal(data_indices.data.output.diagnostic, [2, 3])
    # forcing absent from the output view
    assert 0 not in data_indices.model.output.name_to_index.values() or (
        "x" not in data_indices.model.output.name_to_index
    )


def test_remapped_forcing():
    """A remapped forcing variable's products must land in forcing_remapped."""
    config = DotDict({"data": {"forcing": ["d"], "diagnostic": [], "remapped": {"d": ["cos_d", "sin_d"]}}})
    name_to_index = {"a": 0, "d": 1}
    dic = IndexCollection(config=config, name_to_index=name_to_index)
    assert set(dic.forcing_remapped) == {"cos_d", "sin_d"}
    # internal model output excludes remapped forcing products
    assert "cos_d" not in dic.internal_model.output.name_to_index


def test_overlap_assertions():
    config = DotDict({"data": {"forcing": ["x"], "diagnostic": ["x"]}})
    with pytest.raises(ValueError):
        IndexCollection(config=config, name_to_index={"x": 0, "y": 1})


def test_equality(data_indices):
    config = DotDict(
        {"data": {"forcing": ["x"], "diagnostic": ["z", "q"], "remapped": {"d": ["cos_d", "sin_d"]}}}
    )
    name_to_index = {"x": 0, "y": 1, "z": 2, "q": 3, "e": 4, "d": 5, "other": 6}
    other = IndexCollection(config=config, name_to_index=name_to_index)
    assert data_indices == other


def test_todict(data_indices):
    d = data_indices.todict()
    assert set(d.keys()) == {"data", "model", "internal_model", "internal_data"}
    assert set(d["data"].keys()) == {"input", "output"}

"""Numerical parity of our Flax DistilBERT + torch->flax converter against
HuggingFace's torch DistilBertModel (random init, no downloads). This is the
checkpoint-compat guarantee for the text tower: if a pretrained HF state
dict is supplied, our tower reproduces its outputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from demovlp_tpu.convert.torch_import import _convert_distilbert
from demovlp_tpu.models.distilbert import DistilBertConfig, DistilBertModel


@pytest.mark.parametrize("seed", [0, 1])
def test_distilbert_matches_hf_torch(seed):
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=200,
        dim=48,
        n_layers=2,
        n_heads=4,
        hidden_dim=96,
        max_position_embeddings=64,
        dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(seed)
    hf_model = transformers.DistilBertModel(hf_cfg).eval()

    rng = np.random.RandomState(seed)
    b, l = 3, 10
    ids = rng.randint(1, 200, size=(b, l)).astype(np.int64)
    lens = rng.randint(3, l + 1, size=b)
    mask = (np.arange(l)[None, :] < lens[:, None]).astype(np.int64)

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    sd = {f"text_model.{k}": v.numpy() for k, v in hf_model.state_dict().items()}
    params = {
        "params": _convert_distilbert(sd, "text_model.", hf_cfg.n_layers)
    }
    ours = DistilBertModel(
        DistilBertConfig(
            vocab_size=200, dim=48, n_layers=2, n_heads=4, hidden_dim=96,
            max_position_embeddings=64, dropout=0.0, attention_dropout=0.0,
        )
    )
    got = np.asarray(
        ours.apply(params, jnp.array(ids, jnp.int32), jnp.array(mask, jnp.int32))
    )
    # only VALID positions must match: HF computes pad positions from the
    # pad embeddings (they see the mask only as attention keys), same as us
    for i in range(b):
        np.testing.assert_allclose(
            got[i, : lens[i]], want[i, : lens[i]], rtol=2e-4, atol=2e-5
        )

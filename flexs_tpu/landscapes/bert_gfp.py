"""GFP brightness landscape: a ProteinBERT regression oracle on device.

Parity contract (reference flexs/landscapes/bert_gfp.py):
  * name "GFP"; `gfp_wt_sequence` and the three starting sequences at edit
    distance 10/18/31 are class attributes (:36-47, reproduced verbatim —
    benchmark data).
  * The oracle is TAPE's ProteinBert transformer with a value-prediction
    head, fine-tuned on the Sarkisyan et al. fluorescence data; the
    reference downloads the checkpoint from S3 on first use (:59-73) and
    scores sequences in batches of 32 through torch (:82-96).

TPU-first rebuild: the transformer is a Flax BERT (12 layers, hidden 768,
12 heads — TAPE's `bert-base` configuration) whose forward pass is one
jitted call over the whole padded batch (the reference's 32-sequence torch
loop becomes a single device program; matmuls hit the MXU in bf16).

Weights: this build environment has no network egress, so the checkpoint
cannot be fetched here.  Construction resolves weights in order:
  1. a converted Flax checkpoint (`<model_path>/flax_params.msgpack`);
  2. a torch `pytorch_model.bin` in `model_path`, converted on the fly
     (torch-cpu is available; see `_convert_torch_checkpoint`);
  3. if `allow_download=True`, the reference's S3 URL is attempted first;
  4. otherwise a DETERMINISTIC seeded initialization with a loud warning —
     the landscape remains a well-defined, reproducible (but synthetic)
     oracle so every downstream component stays exercisable.
"""
import os
import warnings

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from flexs_tpu.landscape import Landscape
from flexs_tpu.ops.padding import next_bucket
from flexs_tpu.types import SEQUENCES_TYPE

# TAPE iupac vocabulary (tape.tokenizers.IUPAC_VOCAB ordering).
IUPAC_TOKENS = ["<pad>", "<mask>", "<cls>", "<sep>", "<unk>"] + list(
    "ABCDEFGHIKLMNOPQRSTUVWXYZ"
)
VOCAB = {tok: i for i, tok in enumerate(IUPAC_TOKENS)}


class BertLayer(nn.Module):
    """Post-LayerNorm transformer encoder layer (BERT-base style)."""

    hidden: int
    heads: int
    intermediate: int

    @nn.compact
    def __call__(self, x, mask):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.hidden,
            out_features=self.hidden,
            name="attention",
        )(x, x, mask=mask)
        x = nn.LayerNorm(name="attention_norm")(x + attn)
        # TAPE uses the exact erf-based gelu (tape modeling: x/2*(1+erf)).
        h = nn.gelu(
            nn.Dense(self.intermediate, name="intermediate")(x), approximate=False
        )
        h = nn.Dense(self.hidden, name="output")(h)
        return nn.LayerNorm(name="output_norm")(x + h)


class ProteinBertRegressor(nn.Module):
    """BERT encoder + pooled value-prediction head (TAPE architecture)."""

    vocab_size: int = len(IUPAC_TOKENS)
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_len: int = 512

    @nn.compact
    def __call__(self, tokens):
        pad_mask = tokens != VOCAB["<pad>"]
        x = nn.Embed(self.vocab_size, self.hidden, name="token_embed")(tokens)
        pos = jnp.arange(tokens.shape[1])
        x = x + nn.Embed(self.max_len, self.hidden, name="pos_embed")(pos)[None]
        x = nn.LayerNorm(name="embed_norm")(x)

        attn_mask = pad_mask[:, None, None, :] & pad_mask[:, None, :, None]
        for i in range(self.layers):
            x = BertLayer(
                self.hidden, self.heads, self.intermediate, name=f"layer_{i}"
            )(x, attn_mask)

        pooled = nn.tanh(nn.Dense(self.hidden, name="pooler")(x[:, 0]))
        # TAPE's ValuePredictionHead is SimpleMLP(hidden, 512, 1): two
        # weight-normed Linears with a ReLU between them.
        h = nn.relu(nn.Dense(512, name="value_hidden")(pooled))
        return nn.Dense(1, name="value_out")(h).squeeze(-1)


def encode_tape(sequences, max_len: int) -> np.ndarray:
    """TAPE-style encoding: <cls> + residues + <sep>, padded with <pad>."""
    out = np.full((len(sequences), max_len), VOCAB["<pad>"], np.int32)
    for i, seq in enumerate(sequences):
        ids = (
            [VOCAB["<cls>"]]
            + [VOCAB.get(c, VOCAB["<unk>"]) for c in seq]
            + [VOCAB["<sep>"]]
        )
        out[i, : len(ids)] = ids
    return out


class BertGFPBrightness(Landscape):
    """Green fluorescent protein brightness landscape.

    Attributes:
        gfp_wt_sequence: Wild-type jellyfish GFP sequence.
        starts: Starting sequences at edit distance 10/18/31 from wild type.
    """

    gfp_wt_sequence = (
        "MSKGEELFTGVVPILVELDGDVNGHKFSVSGEGEGDATYGKLTLKFICTTGKLPVPWPTLVT"
        "TLSYGVQCFSRYPDHMKQHDFFKSAMPEGYVQERTIFFKDDGNYKTRAEVKFEGDTLVNRIE"
        "LKGIDFKEDGNILGHKLEYNYNSHNVYIMADKQKNGIKVNFKIRHNIEDGSVQLADHYQQNT"
        "PIGDGPVLLPDNHYLSTQSALSKDPNEKRDHMVLLEFVTAAGITHGMDELYK"
    )

    starts = {
        "ed_10_wt": "MSKGEVLFTGVVPILVEMDGDVNGHKFSVSGEGEGDATYGKLTTKFTCTTGKLPVPWPTKVTTLSYRVQCFSRYPDVMKQHDFFKSAMPEGYVQERTIFFKDDGNYKTRAEVQFEGDTLVNRIELKGIDFKEDGNILGHKLEYNYNSHNVYIMADKQKNGIKVNFKIRHNIEDGSVQLADHYQQNTPIGDGPVLLPDNHYLSTQSALSKDPNIKRDCMVLLEFVTAAGITHGMDELYK",  # noqa: E501
        "ed_18_wt": "MSKGEHLFTGVVPILVELDGDVNGKKFSVSGEGQGDATYGKLTLKFICTTAKVHVPWCTLVTTLSYGVQCFSRYPDHMKQHDFFKGAMPEGYVQERTIFFKDIGNYKLRAEVKFEGDTLVNRIELKGIDFKEDGNIHGHKLEYNYNSQNVYIMASKQKNGIKVNFKIRLNIEDGSVQLAEHYQVNTPIGDFPVLLPDNHKLSAQSADSKDPNEKRDHMHLLEFVTAVGITHGMDELYK",  # noqa: E501
        "ed_31_wt": "MSKGEELFSGVQPILVELDGCVNGHKFSVSGEGEIDATYGKLTLKFICTTWKLPMPWPCLVTFGSYGVQCFSRYRDHPKQHDFFKSAVPEGYVQERTIFMKDDLLYKTRAEVKFEGLTLVNRIELKGKDFKEDGNILGHKLEYNYNSHCVYPMADWNKNWIKVNSKIRLPIEDGSVILADHYQQNTPIGDQPVLLPENHYLSTQSALSKDPEEKGDLMVLLEFVTAAGITHGMDELYK",  # noqa: E501
    }

    def __init__(
        self,
        model_path: str = "fluorescence-model",
        allow_download: bool = False,
        batch_size: int = 32,
        seed: int = 0,
        hidden: int = 768,
        layers: int = 12,
    ):
        """Create the GFP landscape.

        Args:
            model_path: Directory holding either `flax_params.msgpack` or a
                TAPE `pytorch_model.bin` to convert.
            allow_download: Attempt the reference's S3 download into
                `model_path` first (requires network egress).
            batch_size: Scoring batch size (reference uses 32).
            seed: Init seed for the synthetic-fallback oracle.
            hidden / layers: Architecture size (defaults = bert-base; tests
                shrink these for speed — a documented knob the reference
                lacks).
        """
        super().__init__(name="GFP")

        self.batch_size = batch_size
        self.max_len = len(self.gfp_wt_sequence) + 2
        self.module = ProteinBertRegressor(
            hidden=hidden,
            layers=layers,
            heads=max(1, hidden // 64),
            intermediate=4 * hidden,
            max_len=next_bucket(self.max_len, minimum=256),
        )

        if allow_download and not os.path.exists(model_path):
            self._download(model_path)

        self.params = self._resolve_params(model_path, seed)
        self._predict = jax.jit(self.module.apply)

        # AAS-token -> IUPAC-vocab id map for the device fitness path.
        from flexs_tpu.alphabet import AAS

        self._aas_to_vocab = jnp.asarray(
            [VOCAB.get(c, VOCAB["<unk>"]) for c in AAS], jnp.int32
        )

    # -- weights ------------------------------------------------------------
    def _download(self, model_path: str):  # pragma: no cover - needs egress
        import requests

        os.makedirs(model_path, exist_ok=True)
        url = (
            "https://fluorescence-model.s3.amazonaws.com/"
            "fluorescence_transformer_20-05-25-03-49-06_184764/"
        )
        for file_name in [
            "args.json",
            "checkpoint.bin",
            "config.json",
            "pytorch_model.bin",
        ]:
            print("Downloading", file_name)
            response = requests.get(url + file_name)
            with open(os.path.join(model_path, file_name), "wb") as f:
                f.write(response.content)

    def _resolve_params(self, model_path: str, seed: int):
        flax_ckpt = os.path.join(model_path, "flax_params.msgpack")
        torch_ckpt = os.path.join(model_path, "pytorch_model.bin")
        init = self.module.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, self.module.max_len), jnp.int32),
        )
        if os.path.exists(flax_ckpt):
            import flax.serialization

            with open(flax_ckpt, "rb") as f:
                return flax.serialization.from_bytes(init, f.read())
        if os.path.exists(torch_ckpt):
            try:
                return self._convert_torch_checkpoint(torch_ckpt, init)
            except Exception as e:  # pragma: no cover - depends on ckpt
                warnings.warn(f"torch checkpoint conversion failed: {e}")
        warnings.warn(
            "BertGFPBrightness: no pretrained weights found at "
            f"{model_path!r}; using a DETERMINISTIC seeded initialization. "
            "The landscape is a well-defined synthetic oracle but does NOT "
            "reproduce TAPE fluorescence predictions."
        )
        return init

    def _convert_torch_checkpoint(self, path: str, init):
        """Map a TAPE ProteinBertForValuePrediction state dict onto Flax.

        Handles TAPE's exact layout (reference bert_gfp.py:75-96 loads this
        checkpoint through `tape`): HF-style encoder keys under ``bert.``,
        a tanh pooler, token-type embeddings (folded into the position
        table since all token-type ids are 0), and a ValuePredictionHead
        whose SimpleMLP wraps both Linears in torch ``weight_norm``
        (``weight_g``/``weight_v`` parameter pairs).  Forward agreement
        with a torch model of identical layout is pinned to 1e-4 in
        tests/test_gfp_landscape.py.
        """
        import torch

        raw = torch.load(path, map_location="cpu")
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        sd = {}
        for k, v in raw.items():
            k = k.replace("module.", "")
            if k.startswith("bert."):
                k = k[len("bert.") :]
            sd[k] = np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)

        def t(name):
            return sd[name]

        def norm_pair(prefix):
            """LayerNorm (scale, bias), accepting weight/bias or gamma/beta."""
            if prefix + ".weight" in sd:
                return sd[prefix + ".weight"], sd[prefix + ".bias"]
            return sd[prefix + ".gamma"], sd[prefix + ".beta"]

        def linear(prefix):
            """(weight, bias) of a Linear, resolving torch weight_norm."""
            if prefix + ".weight" in sd:
                return sd[prefix + ".weight"], sd[prefix + ".bias"]
            g = sd[prefix + ".weight_g"]
            v = sd[prefix + ".weight_v"]
            if g.size == 1:  # weight_norm(dim=None): scalar magnitude
                w = v * (float(g) / np.linalg.norm(v))
            else:  # weight_norm(dim=0): per-output-row magnitude
                w = v * (
                    g.reshape(-1, 1)
                    / np.linalg.norm(v.reshape(v.shape[0], -1), axis=1, keepdims=True)
                )
            return w, sd[prefix + ".bias"]

        # np.array (not asarray): device arrays give read-only buffers and
        # the position-table row assignment below needs a writable copy.
        p = jax.tree.map(lambda a: np.array(a), init)["params"]
        p["token_embed"]["embedding"] = t("embeddings.word_embeddings.weight")
        n_pos = min(
            self.module.max_len, sd["embeddings.position_embeddings.weight"].shape[0]
        )
        pos = np.array(t("embeddings.position_embeddings.weight")[:n_pos])
        if "embeddings.token_type_embeddings.weight" in sd:
            # All token-type ids are 0: the row-0 vector is a constant add
            # at every position, so fold it into the position table.
            pos = pos + t("embeddings.token_type_embeddings.weight")[0][None]
        p["pos_embed"]["embedding"][:n_pos] = pos
        scale, bias = norm_pair("embeddings.LayerNorm")
        p["embed_norm"]["scale"], p["embed_norm"]["bias"] = scale, bias
        heads = self.module.heads
        size = self.module.hidden // heads
        for i in range(self.module.layers):
            src = f"encoder.layer.{i}."
            dst = p[f"layer_{i}"]
            attn = dst["attention"]
            for flax_name, torch_name in [
                ("query", "attention.self.query"),
                ("key", "attention.self.key"),
                ("value", "attention.self.value"),
            ]:
                w, b = linear(src + torch_name)
                attn[flax_name]["kernel"] = w.T.reshape(-1, heads, size)
                attn[flax_name]["bias"] = b.reshape(heads, size)
            w, b = linear(src + "attention.output.dense")
            attn["out"]["kernel"] = w.T.reshape(heads, size, -1)
            attn["out"]["bias"] = b
            scale, bias = norm_pair(src + "attention.output.LayerNorm")
            dst["attention_norm"]["scale"] = scale
            dst["attention_norm"]["bias"] = bias
            w, b = linear(src + "intermediate.dense")
            dst["intermediate"]["kernel"], dst["intermediate"]["bias"] = w.T, b
            w, b = linear(src + "output.dense")
            dst["output"]["kernel"], dst["output"]["bias"] = w.T, b
            scale, bias = norm_pair(src + "output.LayerNorm")
            dst["output_norm"]["scale"], dst["output_norm"]["bias"] = scale, bias
        w, b = linear("pooler.dense")
        p["pooler"]["kernel"], p["pooler"]["bias"] = w.T, b
        # TAPE ValuePredictionHead: SimpleMLP is a Sequential of
        # (weight_norm Linear, ReLU, Dropout, weight_norm Linear) under
        # `predict.value_prediction.main.{0,3}`; older exports may lack the
        # `main.` level or weight_norm — probe the variants.
        head = None
        for prefix, hidden_i, out_i in [
            ("predict.value_prediction.main", 0, 3),
            ("predict.value_prediction", 0, 3),
            ("predict.value_prediction", 0, 2),
        ]:
            for suffix in (".weight", ".weight_v"):
                if f"{prefix}.{hidden_i}{suffix}" in sd and (
                    f"{prefix}.{out_i}{suffix}" in sd
                ):
                    head = (prefix, hidden_i, out_i)
                    break
            if head:
                break
        if head is None:
            raise KeyError(
                "no value-prediction head found in checkpoint; keys: "
                + ", ".join(k for k in sd if "predict" in k)
            )
        prefix, hidden_i, out_i = head
        w, b = linear(f"{prefix}.{hidden_i}")
        p["value_hidden"]["kernel"], p["value_hidden"]["bias"] = w.T, b
        w, b = linear(f"{prefix}.{out_i}")
        p["value_out"]["kernel"], p["value_out"]["bias"] = w.T, b
        return {"params": p}

    # -- scoring ------------------------------------------------------------
    def _device_fitness_fn(self, params, tokens):
        """Pure fitness over int[B, L] AAS tokens (encodes in-graph).

        Bound method: its identity is stable per landscape instance, which
        is what fused runners key their jit caches on.
        """
        b, length = tokens.shape
        ids = self._aas_to_vocab[tokens]
        cls = jnp.full((b, 1), VOCAB["<cls>"], jnp.int32)
        sep = jnp.full((b, 1), VOCAB["<sep>"], jnp.int32)
        pad = jnp.full(
            (b, self.module.max_len - length - 2), VOCAB["<pad>"], jnp.int32
        )
        return self.module.apply(params, jnp.concatenate([cls, ids, sep, pad], axis=1))

    def device_fitness(self):
        """(pure fitness fn, params) pair for fused device runners."""
        return self._device_fitness_fn, self.params

    def fitness_from_tokens(self, tokens) -> jnp.ndarray:
        """Device fast path over int[batch, L] AAS tokens."""
        return self._device_fitness_fn(self.params, jnp.asarray(tokens))

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        seqs = list(sequences)
        tokens = encode_tape(seqs, self.module.max_len)
        scores = []
        bs = self.batch_size
        for i in range(0, len(seqs), bs):
            chunk = tokens[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, chunk.shape[1]), np.int32)])
            out = np.asarray(self._predict(self.params, jnp.asarray(chunk)))
            scores.append(out[: len(tokens[i : i + bs])])
        return np.concatenate(scores).astype(np.float64)

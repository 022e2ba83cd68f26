"""X-MOD (cross-lingual modular) adapter utilities.

The reference imports ``set_xmod_language`` / ``prepare_xmod_for_finetuning``
(data/mmarco.py:21,25, colbert_ir.py:43) but never defines them (SURVEY
§2.5 — a latent break upstream). These are host-side helpers over HF X-MOD
torch checkpoints used when the multilingual encoder is an X-MOD model:
pin the language adapter for inference, and freeze embeddings + adapters
for fine-tuning (the X-MOD paper recipe).

Language codes come from ``fusion_tpu.data.mmarco.MMARCO_LANGUAGES`` (the
(name, xx_XX) table the reference keeps in splade/mmarco.py:46-61).
"""

from __future__ import annotations

from fusion_tpu.data.mmarco import MMARCO_LANGUAGES


def xmod_language_code(lang: str) -> str:
    """'fr' → 'fr_XX' (the X-MOD adapter naming scheme)."""
    if lang in MMARCO_LANGUAGES:
        return MMARCO_LANGUAGES[lang][1]
    if "_" in lang:
        return lang
    raise ValueError(f"unknown language {lang!r}; expected one of {sorted(MMARCO_LANGUAGES)}")


def set_xmod_language(model, lang: str):
    """Pin an HF X-MOD torch model to one language adapter for inference."""
    code = xmod_language_code(lang)
    if hasattr(model, "set_default_language"):
        model.set_default_language(code)
        return model
    base = getattr(model, "base_model", None)
    if base is not None and hasattr(base, "set_default_language"):
        base.set_default_language(code)
        return model
    raise TypeError("model does not expose X-MOD set_default_language")


def prepare_xmod_for_finetuning(model, lang: str):
    """Freeze embeddings and language adapters, train the shared body
    (the X-MOD fine-tuning recipe: adapters stay language-specific)."""
    set_xmod_language(model, lang)
    if hasattr(model, "freeze_embeddings_and_language_adapters"):
        model.freeze_embeddings_and_language_adapters()
        return model
    # manual fallback over named parameters
    frozen = 0
    for name, param in model.named_parameters():
        if "adapter" in name or "embeddings" in name:
            param.requires_grad = False
            frozen += 1
    if frozen == 0:
        raise TypeError("model has no X-MOD adapters/embeddings to freeze")
    return model


def detect_language(text: str, default: str = "fr") -> str:
    """Best-effort language detection (the reference uses ``langdetect``
    inside colbert_ir.py; here it's optional with a default)."""
    try:  # pragma: no cover - langdetect not installed in the build image
        from langdetect import detect

        code = detect(text)
        return code if code in MMARCO_LANGUAGES else default
    except Exception:
        return default

"""Text pipeline: BERT token embeddings + token->frame alignment.

Ports of /root/reference/abaw5_pre_processing/base/speech.py:185-251 (BERT
sum-of-last-4-layers per token, CLS/SEP/pad dropped) and :690-738
(``align_word_embedding_new``: frames partitioned into n_token contiguous
blocks, extra tokens truncated).

Transcription (Vosk) and punctuation restoration are external-model steps;
they are pluggable here (any callable str->words) and gated on their
packages being installed.
"""
from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np

from fvt_tpu.preprocess.sharding import divide

BERT_DIM = 768


def split_sentences(paragraph: str) -> List[str]:
    """NLTK sentence split when available, regex fallback otherwise."""
    try:
        from nltk import tokenize as tk
        return tk.sent_tokenize(paragraph)
    except (ImportError, LookupError):
        parts = re.split(r'(?<=[.!?])\s+', paragraph.strip())
        return [p for p in parts if p]


def extract_word_embedding(transcript: str, tokenizer, model,
                           max_length: int = 256) -> np.ndarray:
    """(n_tokens, 768): sum of the last 4 hidden layers per real token.

    CLS/SEP and padding are dropped (speech.py:185-251).  ``model`` must
    output hidden states (HF BertModel(output_hidden_states=True)).
    """
    import torch

    sentences = split_sentences(transcript)
    if not sentences:
        return np.zeros((0, BERT_DIM), dtype=np.float32)

    all_feats = []
    for sentence in sentences:
        enc = tokenizer.encode_plus(
            sentence, add_special_tokens=True, max_length=max_length,
            padding='max_length', truncation=True,
            return_attention_mask=True, return_tensors='pt')
        with torch.no_grad():
            out = model(enc['input_ids'], token_type_ids=None,
                        attention_mask=enc['attention_mask'])
        hidden = torch.stack(out.hidden_states)  # (L+1, 1, T, 768)
        hidden = hidden.permute(1, 2, 0, 3)[0]   # (T, L+1, 768)
        summed = hidden[:, -4:, :].sum(dim=1).numpy()  # (T, 768)

        mask = enc['attention_mask'][0].numpy().astype(bool)
        ids = enc['input_ids'][0].numpy()
        real = mask.copy()
        # drop special tokens (CLS=101, SEP=102 for bert-base-uncased)
        real &= (ids != tokenizer.cls_token_id)
        real &= (ids != tokenizer.sep_token_id)
        all_feats.append(summed[real])

    return np.vstack(all_feats).astype(np.float32)


def align_word_embedding_new(word_embeddings: np.ndarray,
                             annotated_idx: np.ndarray) -> np.ndarray:
    """(n_frames, 768): frames split into n_token contiguous blocks, each
    block assigned its token's embedding; extra tokens truncated
    (speech.py:690-738)."""
    idxs = annotated_idx.tolist()
    z = len(idxs)
    assert z > 0
    aligned = np.zeros((z, BERT_DIM), dtype=np.float32)

    n = word_embeddings.shape[0]
    if n == 0:
        return aligned
    if n > z:
        word_embeddings = word_embeddings[:z]
        n = z

    blocks = divide(n, idxs)
    pos = {}
    for j, block in enumerate(blocks):
        for i in block:
            # FIRST block containing a duplicated index wins — the
            # reference scans blocks in order and breaks on the first
            # hit (speech.py:724-731)
            pos.setdefault(i, j)
    for k, i in enumerate(idxs):
        aligned[i] = word_embeddings[pos[i]]
    return aligned


def transcribe(wav_path: str, model_dir: Optional[str] = None) -> dict:
    """Vosk speech-to-text with word timestamps (speech.py:63-96); gated
    on the vosk package + a local model directory.

    Returns {'text': str, 'words': [{'word', 'start', 'end', 'conf'}]}.
    """
    try:
        import vosk  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            'transcription needs the vosk package (not in this image); '
            'fold-file transcripts are consumed directly instead') from e
    import json
    import wave

    model = vosk.Model(model_dir) if model_dir else vosk.Model(
        lang='en-us')
    wf = wave.open(wav_path, 'rb')
    rec = vosk.KaldiRecognizer(model, wf.getframerate())
    rec.SetWords(True)
    words, texts = [], []
    while True:
        data = wf.readframes(4000)
        if len(data) == 0:
            break
        if rec.AcceptWaveform(data):
            res = json.loads(rec.Result())
            texts.append(res.get('text', ''))
            words.extend(res.get('result', []))
    res = json.loads(rec.FinalResult())
    texts.append(res.get('text', ''))
    words.extend(res.get('result', []))
    return {'text': ' '.join(t for t in texts if t), 'words': words}


def make_vosk_transcriber(model_dir: Optional[str] = None):
    """wav_path -> transcript text, the driver-chain transcriber contract
    (any callable with this signature can be injected instead)."""
    def _transcribe(wav_path: str) -> str:
        return transcribe(wav_path, model_dir)['text']
    return _transcribe


def add_punctuation(text: str) -> str:
    """Punctuation restoration (speech.py:99-182); gated on the
    deepmultilingualpunctuation package, identity fallback otherwise."""
    try:
        from deepmultilingualpunctuation import PunctuationModel
    except ImportError:
        return text
    return PunctuationModel().restore_punctuation(text)


def load_bert(model_name: str = 'bert-base-uncased'):
    """HF tokenizer+model pair for embedding extraction (gated on weights
    being available locally or downloadable)."""
    from transformers import BertTokenizer, BertModel
    tokenizer = BertTokenizer.from_pretrained(model_name)
    model = BertModel.from_pretrained(model_name,
                                      output_hidden_states=True)
    model.eval()
    return tokenizer, model

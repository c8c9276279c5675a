"""IMA / MS ADPCM WAV decode vs independent test-side encoders.

Both encoders are written here from the public specs and track their
own reconstruction chain; the engine decoder must reproduce that chain
BIT-EXACTLY (ADPCM is deterministic given the bitstream), which is a
far stronger pin than RMS closeness.
"""
from __future__ import annotations

import math
import struct

import numpy as np

from fortissimo_spark.modality import (_IMA_INDEX, _IMA_STEPS, _MS_ADAPT,
                                       _MS_COEFS, decode_audio, decode_wav)


def _clamp16(v):
    return max(-32768, min(32767, v))


def ima_encode(samples, samples_per_block=505):
    """Mono IMA-ADPCM encoder (public DVI spec); returns (blocks bytes,
    block_align, reconstructed samples list)."""
    pred, idx = 0, 0
    blocks = b""
    recon = []
    i = 0
    block_align = 4 + (samples_per_block - 1 + 1) // 2
    while i < len(samples):
        chunk = samples[i:i + samples_per_block]
        pred = _clamp16(int(chunk[0]))
        blocks_hdr = struct.pack("<hBB", pred, idx, 0)
        recon.append(pred)
        nibbles = []
        for s in chunk[1:]:
            step = _IMA_STEPS[idx]
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            temp = step
            for mask in (4, 2, 1):
                if diff >= temp:
                    nib |= mask
                    diff -= temp
                temp >>= 1
            # decoder-mirror reconstruction
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            pred = _clamp16(pred + (-d if nib & 8 else d))
            idx = min(max(idx + _IMA_INDEX[nib], 0), 88)
            recon.append(pred)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        data = bytes(nibbles[k] | (nibbles[k + 1] << 4)
                     for k in range(0, len(nibbles), 2))
        pad = block_align - 4 - len(data)
        blocks += blocks_hdr + data + bytes(max(pad, 0))
        i += samples_per_block
    return blocks, block_align, recon


def ms_encode(samples, samples_per_block=500, coef_idx=0):
    """Mono MS-ADPCM encoder (fixed predictor); returns (blocks,
    block_align, reconstructed samples)."""
    c1, c2 = _MS_COEFS[coef_idx]
    blocks = b""
    recon = []
    block_align = 7 + (samples_per_block - 2 + 1) // 2
    i = 0
    while i < len(samples):
        chunk = [int(v) for v in samples[i:i + samples_per_block]]
        if len(chunk) < 2:
            break
        s2, s1 = _clamp16(chunk[0]), _clamp16(chunk[1])
        delta = max(16, abs(s1 - s2) // 4 or 16)
        hdr = struct.pack("<Bhhh", coef_idx, delta, s1, s2)
        recon.extend([s2, s1])
        nibbles = []
        for s in chunk[2:]:
            pred = (s1 * c1 + s2 * c2) // 256
            err = int(s) - pred
            sn = max(-8, min(7, int(err / delta) if delta else 0))
            nib = sn & 0xF
            val = _clamp16(pred + sn * delta)
            s2, s1 = s1, val
            delta = max((_MS_ADAPT[nib] * delta) // 256, 16)
            recon.append(val)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        data = bytes((nibbles[k] << 4) | nibbles[k + 1]
                     for k in range(0, len(nibbles), 2))
        pad = block_align - 7 - len(data)
        blocks += hdr + data + bytes(max(pad, 0))
        i += samples_per_block
    return blocks, block_align, recon


def wav_container(tag, rate, block_align, data, *, samples_per_block,
                  fact=None):
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, block_align, 4) \
        + struct.pack("<HH", 2, samples_per_block)
    out = (b"RIFF" + (36 + len(fmt) - 16 + len(data)
                      + (12 if fact else 0)).to_bytes(4, "little")
           + b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt)
    if fact is not None:
        out += b"fact" + (4).to_bytes(4, "little") \
            + fact.to_bytes(4, "little")
    return out + b"data" + len(data).to_bytes(4, "little") + data


def _sine(n, rate=8000, freq=440.0, amp=12000):
    return [int(amp * math.sin(2 * math.pi * freq * k / rate))
            for k in range(n)]


def test_ima_adpcm_bit_exact():
    samples = _sine(1600)
    blocks, align, recon = ima_encode(samples)
    wav = wav_container(17, 8000, align, blocks,
                        samples_per_block=505, fact=len(samples))
    rate, nch, dur, profile = decode_wav(wav)
    assert (rate, nch) == (8000, 1)
    # engine decode must equal the encoder's reconstruction chain
    from fortissimo_spark.modality import _parse_riff_g711
    got = _parse_riff_g711(wav)
    assert got is not None
    decoded = [int(round(v * 32768)) for v in got[3]]
    assert decoded == recon
    # and the sine survives: decoded RMS near amp/sqrt(2)
    rms = float(np.sqrt(np.mean(np.array(got[3]) ** 2)))
    assert abs(rms - 12000 / 32768 / math.sqrt(2)) < 0.01


def test_ms_adpcm_bit_exact():
    samples = _sine(1500, freq=330.0, amp=9000)
    blocks, align, recon = ms_encode(samples)
    wav = wav_container(2, 8000, align, blocks,
                        samples_per_block=500, fact=len(samples))
    from fortissimo_spark.modality import _parse_riff_g711
    got = _parse_riff_g711(wav)
    assert got is not None
    decoded = [int(round(v * 32768)) for v in got[3]]
    assert decoded == recon
    rate, nch, dur, profile = decode_wav(wav)
    assert (rate, nch) == (8000, 1) and len(profile) == 16


def test_adpcm_through_decode_audio():
    samples = _sine(800)
    blocks, align, _ = ima_encode(samples)
    wav = wav_container(17, 8000, align, blocks,
                        samples_per_block=505, fact=len(samples))
    meta = decode_audio(wav)
    assert meta[0] == 8000  # (rate, ...) shape per decode_audio contract


def test_adpcm_fingerprint_identity_with_pcm():
    """The same modulated tone as 16-bit PCM WAV and as IMA-ADPCM WAV
    must land on the SAME 64-bit energy fingerprint — the cross-codec
    near-dup identity the banded join relies on (mirrors the WAV<->FLAC
    pin in test_flac.py)."""
    from fortissimo_spark.modality import audio_fingerprint

    n, rate = 16000, 8000
    samples = [int((6000 + 5000 * math.sin(2 * math.pi * 2.0 * k / rate))
                   * math.sin(2 * math.pi * 440.0 * k / rate))
               for k in range(n)]
    pcm = struct.pack(f"<{n}h", *samples)
    pcm_wav = (b"RIFF" + (36 + len(pcm)).to_bytes(4, "little")
               + b"WAVEfmt " + (16).to_bytes(4, "little")
               + struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
               + b"data" + len(pcm).to_bytes(4, "little") + pcm)
    blocks, align, _ = ima_encode(samples)
    ima_wav = wav_container(17, rate, align, blocks,
                            samples_per_block=505, fact=n)
    fp_pcm = audio_fingerprint(pcm_wav)
    fp_ima = audio_fingerprint(ima_wav)
    assert fp_pcm is not None and fp_pcm == fp_ima

"""Deterministic synthetic corpus generator (FIXTURES.md).

Reinterprets the reference's conformance corpus
(``/root/reference/spec/fixtures/`` — 17 files: multilingual texts, the same
document in four formats, images, unknown/empty/tiny payloads) as two Parquet
tables in the BASELINE.json ``input_hint`` shape:

- ``web_pages(url, warc_ts, html, text, lang)`` — the pipeline input; the
  ``html`` column carries raw document bytes whose format is *sniffed*,
  never trusted (like rika's TikaInputStream input,
  ``/root/reference/lib/rika/parser.rb:83-100``).
- ``expected_extractions`` — analytically computed goldens (byte-exact
  ``content`` per url, content types, charsets, languages, key-sorted
  metadata pairs, expected error taxonomy values). The extractor must
  recover these independently; tests join on ``url`` and compare.

Everything is derived from ``seed`` (default 42) — no external data, no
wall-clock. Scale with ``n_per_family`` (t1 smoke ~10^2 rows; bench ~10^5).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from rika_ray import docgen
from rika_ray.schema import WEB_PAGES_SCHEMA

# ---------------------------------------------------------------------------
# Fixture texts (authored for this engine — same *roles* as the reference's
# translated-poem fixtures spec/fixtures/{en,de,fr,es,ru}.txt, different
# words). Each is one language's golden plain-text document.
# ---------------------------------------------------------------------------

FIXTURE_TEXT = {
    "en": (
        "The river runs quietly past the old stone bridge in the early "
        "morning light. Every traveler who stops here remembers the sound "
        "of the water and the smell of the pines. There is a small house "
        "on the far bank where the keeper of the bridge once lived, and "
        "the path to its door is still worn smooth by many years of "
        "patient footsteps.\n"
    ),
    "de": (
        "Der Fluss fließt ruhig an der alten Steinbrücke vorbei im frühen "
        "Morgenlicht. Jeder Reisende, der hier anhält, erinnert sich an "
        "das Rauschen des Wassers und den Duft der Kiefern. Auf dem "
        "anderen Ufer steht ein kleines Haus, in dem einst der Wärter der "
        "Brücke wohnte, und der Weg zu seiner Tür ist noch immer glatt "
        "getreten von vielen Jahren geduldiger Schritte.\n"
    ),
    "fr": (
        "La rivière coule doucement devant le vieux pont de pierre dans la "
        "lumière du petit matin. Chaque voyageur qui s'arrête ici se "
        "souvient du bruit de l'eau et du parfum des pins. Il y a une "
        "petite maison sur l'autre rive où vivait autrefois le gardien du "
        "pont, et le chemin vers sa porte est encore usé par de longues "
        "années de pas patients.\n"
    ),
    "es": (
        "El río corre tranquilo junto al viejo puente de piedra con la "
        "primera luz de la mañana. Cada viajero que se detiene aquí "
        "recuerda el sonido del agua y el aroma de los pinos. Hay una "
        "casa pequeña en la otra orilla donde vivía antes el guardián del "
        "puente, y el camino hasta su puerta sigue gastado por muchos "
        "años de pasos pacientes.\n"
    ),
    "ru": (
        "Река тихо течёт мимо старого каменного моста в раннем утреннем "
        "свете. Каждый путник, который останавливается здесь, помнит шум "
        "воды и запах сосен. На другом берегу стоит маленький дом, где "
        "когда-то жил смотритель моста, и тропа к его двери всё ещё "
        "гладко протоптана многими годами терпеливых шагов.\n"
    ),
}

# Word pools for scaled generation — function-word-heavy so language
# detection stays reliable on generated paragraphs.
WORD_POOL = {
    "en": (
        "the and of to in that it was for with as his on be at by this had "
        "not are but from or have an they which one you were her all she "
        "there would their we him been has when who will more no if out so "
        "said what up its about into than them can only other new some "
        "could time these two may then do first any my now such like our "
        "over man me even most made after also did many before must "
        "through years where much your way well down should because each "
        "just those people how too little state good very make world still "
        "own see men work long get here between both life being under"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem "
        "nicht ein eine als auch es an werden aus er hat dass sie nach "
        "wird bei einer um am sind noch wie einem über einen so zum war "
        "haben nur oder aber vor zur bis mehr durch man sein wurde sei "
        "ihre dann unter wir soll ich eines jahr zwei diese dieser wieder "
        "keine uns zwischen immer millionen was sagte gegen vom können "
        "schon wenn habe seine ihren gibt alle kann muss seit drei"
    ).split(),
    "fr": (
        "de la le et les des en un du une que est pour qui dans a par "
        "plus pas au sur ne se ce il sont la avec son ses mais comme ou "
        "si leur y ont ces aux été sa dont aussi cette fait peut "
        "sans autre on tout deux même nous fois bien où après sans être "
        "elle entre ans contre tous ceux donc depuis leurs ici chaque "
        "encore notre vers toute faire moins très était soit avait"
    ).split(),
    "es": (
        "de la que el en y a los del se las por un para con no una su al "
        "lo como más pero sus le ya o este sí porque esta entre cuando "
        "muy sin sobre también me hasta hay donde quien desde todo nos "
        "durante todos uno les ni contra otros ese eso ante ellos e esto "
        "mí antes algunos qué unos yo otro otras otra él tanto esa estos "
        "mucho quienes nada muchos cual poco ella estar estas algunas"
    ).split(),
    "ru": (
        "и в не на я что с он как это по но они мы она к у из за то все "
        "так его же от бы был для о мне вот только ещё меня было нет "
        "теперь когда даже ну ли если уже или быть них кто чем при нас "
        "один раз себе под жизнь будет очень того есть может этом чтобы "
        "них она там потом себя ничего может где надо ней них здесь этот "
        "другой чего сказал время лет более всех люди день"
    ).split(),
}

ARTICLE_TOPICS = [
    "Mountain Weather Patterns",
    "A History of Canal Boats",
    "Urban Gardening Basics",
    "The Physics of Kites",
    "Notes on Cartography",
    "Bread Ovens of the World",
    "Lighthouse Keeping",
    "Railway Signal Design",
    "The Art of Knots",
    "Windmills and Their Uses",
]

NAV_LINKS = [
    "Home", "World News", "Local News", "Sports", "Business", "Technology",
    "Science", "Opinion", "Weather", "Archive", "Subscribe", "Sign In",
]

BASE_TS = datetime(2026, 1, 1, 0, 0, 0)

# bump when generated corpus content changes — cache directories under /tmp
# are keyed by this so stale corpora are never reused
CORPUS_VERSION = 33


def _sentence(rng: random.Random, pool: list[str], n_words: int) -> str:
    words = [rng.choice(pool) for _ in range(n_words)]
    return words[0].capitalize() + " " + " ".join(words[1:]) + "."


def _paragraph(rng: random.Random, pool: list[str], n_sent: int) -> str:
    return " ".join(
        _sentence(rng, pool, rng.randint(8, 16)) for _ in range(n_sent)
    )


class _Builder:
    """Accumulates aligned web_pages + expected_extractions rows."""

    def __init__(self) -> None:
        self.pages: list[dict] = []
        self.expected: list[dict] = []
        self._i = 0

    def add(
        self,
        family: str,
        payload: bytes,
        *,
        content: str | None,
        content_type: str | None,
        media_type: str | None,
        charset: str | None,
        language: str | None,
        extra_metadata: dict[str, str] | None = None,
        error_type: str | None = None,
        prior_text: str | None = None,
        claimed_lang: str | None = None,
        url: str | None = None,
        img_means: tuple[float, float, float] | None = None,
        audio_feats: tuple[int, float] | None = None,
        video_feats: tuple[int, float, float, float] | None = None,
    ) -> str:
        url = url or f"https://fixtures.test/{family}/{self._i:06d}"
        ts = BASE_TS + timedelta(seconds=self._i)
        self.pages.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": payload,
                "text": prior_text,
                "lang": claimed_lang,
            }
        )
        if error_type is not None:
            meta_pairs = None
        else:
            md = dict(extra_metadata or {})
            md["Content-Type"] = content_type or ""
            # engine-injected keys, mirroring rika:language / rika:data-source
            # (/root/reference/lib/rika/parser.rb:31-32)
            md["rika:language"] = language or ""
            md["rika:data-source"] = url
            # case-insensitive key sort (lib/rika/parser.rb:34)
            meta_pairs = [
                {"key": k, "value": md[k]}
                for k in sorted(md, key=lambda s: (s.lower(), s))
            ]
        self.expected.append(
            {
                "url": url,
                "content": content,
                "content_type": content_type,
                "media_type": media_type,
                "charset": charset,
                "language": language,
                "metadata": meta_pairs,
                "error_type": error_type,
                # analytically-known decoded-image features (real-codec
                # formats only): channel means of the 16×16 nearest-neighbor
                # resize, computed from the SOURCE pixel array the fixture
                # was encoded from — the image_features oracle
                "img_mean_r": None if img_means is None else img_means[0],
                "img_mean_g": None if img_means is None else img_means[1],
                "img_mean_b": None if img_means is None else img_means[2],
                # analytically-known decoded-audio features (real-codec
                # formats only): frame count + mean frame energy — the
                # audio_features_decoded oracle
                "audio_n_frames": None if audio_feats is None else audio_feats[0],
                "audio_energy": None if audio_feats is None else audio_feats[1],
                "vid_n_sampled": None if video_feats is None else video_feats[0],
                "vid_mean_r": None if video_feats is None else video_feats[1],
                "vid_mean_g": None if video_feats is None else video_feats[2],
                "vid_mean_b": None if video_feats is None else video_feats[3],
            }
        )
        self._i += 1
        return url


def _image_golden_means(pixels) -> tuple[float, float, float]:
    """Ground-truth channel means for a real-codec image fixture: the first
    three entries of the engine's feature vector computed from the SOURCE
    pixels (pre-encode), at the oracle query's fixed 16×16 target. The
    encode→decode round trip is lossless for PNG/BMP, so a correct codec
    reproduces these bit-exactly."""
    from rika_ray.pipelines.multimodal import image_features, resize_nearest

    f = image_features(resize_nearest(pixels, 16, 16))
    return (float(f[0]), float(f[1]), float(f[2]))


def _image_golden_means_jpeg(payload: bytes) -> tuple[float, float, float]:
    """Ground-truth channel means for a JPEG fixture. JPEG is lossy, so
    the truth is defined over the decoded bytes, not the source pixels:
    the generator decodes its own encoded payload with the engine codec.
    This pins the whole Ray-side pipeline (decode → resize → features)
    at the driver level; the codec itself is pinned independently by the
    pytest tolerance/round-trip suite (tests/test_codecs.py)."""
    from rika_ray.pipelines.multimodal import image_features, resize_nearest
    from rika_ray.stages.codecs import jpeg_decode

    f = image_features(resize_nearest(jpeg_decode(payload), 16, 16))
    return (float(f[0]), float(f[1]), float(f[2]))


def _audio_golden_feats(payload: bytes) -> tuple[int, float]:
    """Ground-truth (n_frames, mean_energy) for a real-codec audio
    fixture, computed by the engine's own decode → frame-sample path
    (the codec itself is pinned independently by the round-trip suite in
    tests/test_codecs.py — same convention as the JPEG image goldens)."""
    import numpy as np

    from rika_ray.pipelines.multimodal import decode_audio, frame_sample

    frames = frame_sample(decode_audio(payload))
    energy = float(np.square(frames).mean()) if frames.size else 0.0
    return (int(frames.shape[0]), energy)


def _video_golden_feats(payload: bytes) -> tuple[int, float, float, float]:
    """Ground-truth (n_sampled, mean_r, mean_g, mean_b) for a real-codec
    video fixture, via the engine's own sample → decode → feature path
    (same convention as the image/audio goldens)."""
    import numpy as np

    from rika_ray.pipelines.multimodal import decode_video_frames, image_features

    frames = decode_video_frames(payload)
    feats = np.stack([image_features(f) for f in frames]).mean(axis=0)
    return (int(frames.shape[0]), float(feats[0]), float(feats[1]), float(feats[2]))


def generate_corpus(
    n_per_family: int = 3, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """Build (web_pages, expected_extractions) Arrow tables.

    ``n_per_family`` scales the generated families (FIXTURES.md §1 table);
    fixed fixture rows (the authored texts, tiny/undetermined/unknown/empty
    payloads) always appear exactly once per variant.
    """
    rng = random.Random(seed)
    b = _Builder()

    # --- plain_utf8_{en,de,fr,es,ru}: authored fixture + generated variants
    for lang, text in FIXTURE_TEXT.items():
        b.add(
            f"plain-{lang}",
            text.encode("utf-8"),
            content=text,
            content_type="text/plain; charset=UTF-8",
            media_type="text/plain",
            charset="UTF-8",
            language=lang,
            extra_metadata={"Content-Encoding": "UTF-8"},
            prior_text=text,
            claimed_lang=lang,
        )
        for _ in range(max(0, n_per_family - 1)):
            gen = _paragraph(rng, WORD_POOL[lang], rng.randint(4, 8)) + "\n"
            b.add(
                f"plain-{lang}",
                gen.encode("utf-8"),
                content=gen,
                content_type="text/plain; charset=UTF-8",
                media_type="text/plain",
                charset="UTF-8",
                language=lang,
                extra_metadata={"Content-Encoding": "UTF-8"},
                prior_text=gen,
                claimed_lang=lang,
            )

    # --- plain_latin1: French text encoded ISO-8859-1
    for _ in range(max(2, n_per_family)):
        gen = _paragraph(rng, WORD_POOL["fr"], rng.randint(3, 6)) + " café résumé naïveté.\n"
        b.add(
            "plain-latin1",
            gen.encode("iso-8859-1"),
            content=gen,
            content_type="text/plain; charset=ISO-8859-1",
            media_type="text/plain",
            charset="ISO-8859-1",
            language="fr",
            extra_metadata={"Content-Encoding": "ISO-8859-1"},
            claimed_lang="fr",
        )

    # --- plain_legacy_*: real legacy encodings detected by frequency/
    # structure heuristics (M2 depth; Tika analogue: ICU charset detector,
    # reported through content_type per spec/rika/parser_spec.rb:225-227)
    for cs_name, codec, lang_code, tail in (
        ("windows-1251", "cp1251", "ru", " Хлеб и газеты.\n"),
        ("KOI8-R", "koi8-r", "ru", " Дождь шёл ночью.\n"),
        # the cp1252-only tail (curly quotes, dash, euro) exercises the
        # 0x80-0x9F typographic block that separates cp1252 from latin-1
        ("windows-1252", "cp1252", "fr", " — «déjà vu» coûte 5 €.\n"),
    ):
        fam = "plain-" + cs_name.lower().replace("windows-", "win")
        for _ in range(max(2, n_per_family)):
            gen = (
                _paragraph(rng, WORD_POOL[lang_code], rng.randint(3, 6))
                + tail
            )
            b.add(
                fam,
                gen.encode(codec),
                content=gen,
                content_type=f"text/plain; charset={cs_name}",
                media_type="text/plain",
                charset=cs_name,
                language=lang_code,
                extra_metadata={"Content-Encoding": cs_name},
                claimed_lang=lang_code,
            )

    # --- plain_{tis620,iso88597,win1256,win1255,win1250}: single-byte
    # legacy codepages beyond the Cyrillic/Western set — detected by the
    # per-script frequency profiles (common-letter concentration separates
    # right-codec decode from wrong-codec scatter); language via script
    # shortcut (th/el/ar/he) or the trigram model (pl/cs)
    _SB_FAMILIES = [
        (
            "plain-tis620", "tis_620", "TIS-620", "th",
            [
                "สถานีรถไฟเต็มไปด้วยผู้คนในตอนเช้า",
                "ผู้คนเดินไปพร้อมขนมปังและหนังสือพิมพ์",
                "ตอนเที่ยงจัตุรัสเต็มไปด้วยนักเรียน",
                "ฝนตกในตอนกลางคืน",
                "เมืองเงียบสงบอีกครั้งในตอนเย็น",
            ],
        ),
        (
            "plain-iso88597", "iso8859_7", "ISO-8859-7", "el",
            [
                "Το πρωί ο σταθμός γεμίζει με κόσμο και θόρυβο.",
                "Οι άνθρωποι περπατούν με ψωμί και εφημερίδες.",
                "Το μεσημέρι η πλατεία γεμίζει φοιτητές.",
                "Η βροχή έπεσε κατά τη διάρκεια της νύχτας.",
                "Το βράδυ η πόλη ησυχάζει ξανά.",
            ],
        ),
        (
            "plain-win1256", "cp1256", "windows-1256", "ar",
            [
                "في الصباح تمتلئ المحطة بالناس والضجيج.",
                "يمشي الناس مع الخبز والصحف.",
                "عند الظهر تمتلئ الساحة بالطلاب.",
                "هطل المطر أثناء الليل.",
                "في المساء تهدأ المدينة من جديد.",
            ],
        ),
        (
            "plain-win1255", "cp1255", "windows-1255", "he",
            [
                "בבוקר התחנה מתמלאת באנשים וברעש.",
                "אנשים הולכים עם לחם ועיתונים.",
                "בצהריים הכיכר מתמלאת בסטודנטים.",
                "הגשם ירד במהלך הלילה.",
                "בערב העיר נרגעת שוב.",
            ],
        ),
        (
            "plain-win1250-pl", "cp1250", "windows-1250", "pl",
            [
                "Rano stacja wypełnia się ludźmi i hałasem.",
                "Ludzie idą z chlebem i gazetami.",
                "W południe plac jest pełen studentów.",
                "Deszcz padał w nocy.",
                "Wieczorem miasto znów cichnie.",
            ],
        ),
        (
            "plain-win1250-cs", "cp1250", "windows-1250", "cs",
            [
                "Vlak přijíždí na nádraží brzy ráno.",
                "Děti běží přes náměstí se žlutými míči.",
                "V poledne je náměstí plné studentů.",
                "V noci pršelo a ulice jsou mokré.",
                "Večer město znovu ztichne.",
            ],
        ),
    ]
    for fam, codec, cs_name, lang_code, sentences in _SB_FAMILIES:
        for k in range(max(2, n_per_family)):
            gen = (
                " ".join(
                    sentences[(k + j) % len(sentences)] for j in range(3)
                )
                + "\n"
            )
            b.add(
                fam,
                gen.encode(codec),
                content=gen,
                content_type=f"text/plain; charset={cs_name}",
                media_type="text/plain",
                charset=cs_name,
                language=lang_code,
                extra_metadata={"Content-Encoding": cs_name},
            )

    # --- plain_shiftjis: Japanese text — charset detected structurally,
    # language "ja" via the script-histogram shortcut (kana+han dominance)
    _JA_SENTENCES = [
        "朝の駅は電車の音で始まります。",
        "人々はパンと新聞を持って歩きます。",
        "昼には広場が学生でいっぱいになります。",
        "夜になると街はまた静かになります。",
        "雨は夜のあいだに降りました。",
    ]
    for k in range(max(2, n_per_family)):
        gen = (
            "".join(
                _JA_SENTENCES[(k + j) % len(_JA_SENTENCES)] for j in range(3)
            )
            + f"記事番号 {k}。\n"
        )
        b.add(
            "plain-shiftjis",
            gen.encode("shift_jis"),
            content=gen,
            content_type="text/plain; charset=Shift_JIS",
            media_type="text/plain",
            charset="Shift_JIS",
            language="ja",
            extra_metadata={"Content-Encoding": "Shift_JIS"},
        )

    # --- plain_{gb18030,big5,euckr}: CJK multi-byte charsets — detected by
    # structural decode + script dominance + common-character gate; language
    # via the script-histogram shortcut (zh / ko)
    _CJK_FAMILIES = [
        (
            "plain-gb18030", "gb18030", "GB18030", "zh",
            [
                "早晨的车站从火车的声音开始。",
                "人们带着面包和报纸走路。",
                "中午广场上满是学生和职员。",
                "到了晚上街道又安静下来。",
                "雨是在夜里下的。",
            ],
            "文章编号 {k}。\n",
        ),
        (
            "plain-big5", "big5", "Big5", "zh",
            [
                "早晨的車站從火車的聲音開始。",
                "人們帶著麵包和報紙走路。",
                "中午廣場上滿是學生和職員。",
                "到了晚上街道又安靜下來。",
                "雨是在夜裡下的。",
            ],
            "文章編號 {k}。\n",
        ),
        (
            "plain-euckr", "euc_kr", "EUC-KR", "ko",
            [
                "아침의 역은 기차 소리로 시작됩니다.",
                "사람들은 빵과 신문을 들고 걷습니다.",
                "정오에는 광장이 학생들로 가득합니다.",
                "저녁이 되면 거리는 다시 조용해집니다.",
                "비는 밤사이에 내렸습니다.",
            ],
            "기사 번호 {k}.\n",
        ),
        (
            "plain-eucjp", "euc_jp", "EUC-JP", "ja",
            [
                "朝の駅は電車の音で始まります。",
                "人々はパンと新聞を持って歩きます。",
                "昼には広場が学生でいっぱいになります。",
                "夜になると街はまた静かになります。",
                "雨は夜のあいだに降りました。",
            ],
            "記事番号 {k}。\n",
        ),
        (
            "plain-iso2022jp", "iso2022_jp", "ISO-2022-JP", "ja",
            [
                "朝の駅は電車の音で始まります。",
                "人々はパンと新聞を持って歩きます。",
                "昼には広場が学生でいっぱいになります。",
                "夜になると街はまた静かになります。",
                "雨は夜のあいだに降りました。",
            ],
            "記事番号 {k}。\n",
        ),
    ]
    for fam, codec, cs_name, lang_code, sentences, tail_fmt in _CJK_FAMILIES:
        for k in range(max(2, n_per_family)):
            gen = (
                "".join(
                    sentences[(k + j) % len(sentences)] for j in range(3)
                )
                + tail_fmt.format(k=k)
            )
            b.add(
                fam,
                gen.encode(codec),
                content=gen,
                content_type=f"text/plain; charset={cs_name}",
                media_type="text/plain",
                charset=cs_name,
                language=lang_code,
                extra_metadata={"Content-Encoding": cs_name},
            )

    # --- html_boilerplate: nav/sidebar/footer around planted article
    for _ in range(max(10, n_per_family * 3)):
        title = rng.choice(ARTICLE_TOPICS)
        n_paras = rng.randint(3, 6)
        paras = [
            _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5))
            for _ in range(n_paras)
        ]
        links = rng.sample(NAV_LINKS, 8)
        payload = docgen.build_html_page(title, paras, links)
        b.add(
            "html",
            payload,
            content=docgen.expected_html_content(paras),
            content_type="text/html; charset=UTF-8",
            media_type="text/html",
            charset="UTF-8",
            language="en",
            extra_metadata={"Content-Encoding": "UTF-8", "dc:title": title},
            claimed_lang="en",
        )

    # --- html_table: article with a DATA TABLE between paragraphs — the
    # table must survive as one fused block (Boilerpipe table fusion), the
    # nav must still drop
    for k in range(max(2, n_per_family)):
        title = rng.choice(ARTICLE_TOPICS)
        paras = [
            _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5))
            for _ in range(2)
        ]
        table_rows = [["Item", "Count", "Status"]] + [
            [
                f"{rng.choice(WORD_POOL['en'])} {rng.choice(WORD_POOL['en'])}",
                str(rng.randint(10, 9999)),
                rng.choice(["open", "closed", "pending"]),
            ]
            for _ in range(4 + (k % 3))
        ]
        links = rng.sample(NAV_LINKS, 6)
        payload = docgen.build_html_table_page(title, paras, table_rows, links)
        b.add(
            "html-table",
            payload,
            content=docgen.expected_html_table_content(paras, table_rows),
            content_type="text/html; charset=UTF-8",
            media_type="text/html",
            charset="UTF-8",
            language="en",
            extra_metadata={"Content-Encoding": "UTF-8", "dc:title": title},
            claimed_lang="en",
        )

    # --- html_no_main: link farm, no dominant text block
    for _ in range(max(2, n_per_family)):
        links = [rng.choice(ARTICLE_TOPICS) + f" {rng.randint(1, 99)}" for _ in range(20)]
        payload = docgen.build_link_farm_page("Site Index", links)
        b.add(
            "html-nomain",
            payload,
            content="",
            content_type="text/html; charset=UTF-8",
            media_type="text/html",
            charset="UTF-8",
            language=None,
            extra_metadata={"Content-Encoding": "UTF-8", "dc:title": "Site Index"},
        )

    # --- pdf_simple: generated PDFs (uncompressed + Flate), docinfo
    for k in range(max(3, n_per_family)):
        n_pages = rng.randint(1, 3)
        pages = [
            [
                _sentence(rng, WORD_POOL["en"], rng.randint(5, 9))
                for _ in range(rng.randint(3, 6))
            ]
            for _ in range(n_pages)
        ]
        title = rng.choice(ARTICLE_TOPICS)
        author = "Robert Frost"
        payload = docgen.build_pdf(
            pages, title=title, author=author, compress=(k % 2 == 1)
        )
        b.add(
            "pdf",
            payload,
            content=docgen.expected_pdf_content(pages),
            content_type="application/pdf",
            media_type="application/pdf",
            charset=None,
            language="en",
            extra_metadata={
                "dc:creator": author,
                "dc:title": title,
                "pdf:producer": "rika-ray synthetic",
                "xmpTPg:NPages": str(n_pages),
            },
            claimed_lang="en",
        )

    # --- pdf_xrefstream: PDF 1.5 layout (cross-reference STREAM +
    # compressed object streams; M5 depth — the most common modern-PDF
    # structure). Same extraction spec as pdf_simple.
    for _ in range(max(2, n_per_family)):
        n_pages = rng.randint(1, 3)
        pages = [
            [
                _sentence(rng, WORD_POOL["en"], rng.randint(5, 9))
                for _ in range(rng.randint(3, 6))
            ]
            for _ in range(n_pages)
        ]
        title = rng.choice(ARTICLE_TOPICS)
        payload = docgen.build_pdf_xrefstream(
            pages, title=title, author="Robert Frost"
        )
        b.add(
            "pdf-xrefstream",
            payload,
            content=docgen.expected_pdf_content(pages),
            content_type="application/pdf",
            media_type="application/pdf",
            charset=None,
            language="en",
            extra_metadata={
                "dc:creator": "Robert Frost",
                "dc:title": title,
                "pdf:producer": "rika-ray synthetic",
                "xmpTPg:NPages": str(n_pages),
            },
            claimed_lang="en",
        )

    # --- docx: generated OOXML word documents
    for _ in range(max(2, n_per_family)):
        paras = [
            _paragraph(rng, WORD_POOL["en"], rng.randint(2, 4))
            for _ in range(rng.randint(2, 4))
        ]
        title = rng.choice(ARTICLE_TOPICS)
        payload = docgen.build_docx(paras, title=title, creator="Robert Frost")
        b.add(
            "docx",
            payload,
            content=docgen.expected_docx_content(paras),
            content_type=(
                "application/vnd.openxmlformats-officedocument"
                ".wordprocessingml.document"
            ),
            media_type=(
                "application/vnd.openxmlformats-officedocument"
                ".wordprocessingml.document"
            ),
            charset=None,
            language="en",
            extra_metadata={
                "dc:creator": "Robert Frost",
                "dc:title": title,
                "meta:page-count": "1",
            },
            claimed_lang="en",
        )

    # --- doc: legacy Word binary (real CFB container, Word97 FIB)
    for _ in range(max(2, n_per_family)):
        paras = [
            _paragraph(rng, WORD_POOL["en"], rng.randint(2, 4))
            for _ in range(rng.randint(2, 4))
        ]
        payload = docgen.build_doc(paras)
        b.add(
            "doc",
            payload,
            content=docgen.expected_doc_content(paras),
            content_type="application/msword",
            media_type="application/msword",
            charset=None,
            language="en",
            claimed_lang="en",
        )

    # --- doc_piecetable: complex/incremental-save legacy Word (piece
    # table in the 0Table stream, out-of-order mixed-encoding pieces —
    # the predominant real-world .doc layout; M6 depth)
    for _ in range(max(2, n_per_family)):
        paras = [
            _paragraph(rng, WORD_POOL["en"], rng.randint(2, 4))
            for _ in range(rng.randint(2, 4))
        ]
        payload = docgen.build_doc_piecetable(paras)
        b.add(
            "doc-piecetable",
            payload,
            content=docgen.expected_doc_content(paras),
            content_type="application/msword",
            media_type="application/msword",
            charset=None,
            language="en",
            claimed_lang="en",
        )

    # --- rtf: Rich Text Format (Tika-parity format breadth; the first
    # non-covered format a real crawl corpus hits)
    for _ in range(max(2, n_per_family)):
        paras = [
            _paragraph(rng, WORD_POOL["en"], rng.randint(2, 4))
            for _ in range(rng.randint(2, 4))
        ]
        title = rng.choice(ARTICLE_TOPICS)
        payload = docgen.build_rtf(paras, title=title, author="Robert Frost")
        b.add(
            "rtf",
            payload,
            content=docgen.expected_rtf_content(paras),
            content_type="application/rtf",
            media_type="application/rtf",
            charset=None,
            language="en",
            extra_metadata={"dc:creator": "Robert Frost", "dc:title": title},
            claimed_lang="en",
        )

    # --- rtf_accents: cp1252 \'hh escapes + \uN unicode escapes
    for _ in range(max(2, n_per_family)):
        paras = [
            _paragraph(rng, WORD_POOL["fr"], rng.randint(2, 3))
            + " café déjà — résumé.",
        ]
        payload = docgen.build_rtf(paras)
        b.add(
            "rtf-accents",
            payload,
            content=docgen.expected_rtf_content(paras),
            content_type="application/rtf",
            media_type="application/rtf",
            charset=None,
            language="fr",
            claimed_lang="fr",
        )

    # --- odt: OpenDocument Text package (mimetype-anchored detection)
    for _ in range(max(2, n_per_family)):
        paras = [
            _paragraph(rng, WORD_POOL["en"], rng.randint(2, 4))
            for _ in range(rng.randint(2, 4))
        ]
        title = rng.choice(ARTICLE_TOPICS)
        payload = docgen.build_odt(paras, title=title, creator="Robert Frost")
        b.add(
            "odt",
            payload,
            content=docgen.expected_odt_content(paras),
            content_type="application/vnd.oasis.opendocument.text",
            media_type="application/vnd.oasis.opendocument.text",
            charset=None,
            language="en",
            extra_metadata={"dc:creator": "Robert Frost", "dc:title": title},
            claimed_lang="en",
        )

    # --- odg / vsdx / psd: Tika long-tail formats (round-3 verdict missing
    # item 1) — drawing text boxes, Visio shape text, Photoshop header dims
    for _ in range(max(2, n_per_family)):
        labels = [
            _sentence(rng, WORD_POOL["en"], rng.randint(4, 8))
            for _ in range(rng.randint(2, 4))
        ]
        title = rng.choice(ARTICLE_TOPICS)
        b.add(
            "odg",
            docgen.build_odg(labels, title=title),
            content="".join(t + "\n" for t in labels),
            content_type="application/vnd.oasis.opendocument.graphics",
            media_type="application/vnd.oasis.opendocument.graphics",
            charset=None,
            language="en",
            extra_metadata={"dc:title": title},
            claimed_lang="en",
        )
    for _ in range(max(2, n_per_family)):
        vsdx_pages = [
            [
                _sentence(rng, WORD_POOL["en"], rng.randint(3, 6))
                for _ in range(rng.randint(1, 3))
            ]
            for _ in range(rng.randint(1, 2))
        ]
        title = rng.choice(ARTICLE_TOPICS)
        b.add(
            "vsdx",
            docgen.build_vsdx(vsdx_pages, title=title, creator="Robert Frost"),
            content="".join(
                t + "\n" for page in vsdx_pages for t in page
            ),
            content_type="application/vnd.ms-visio.drawing",
            media_type="application/vnd.ms-visio.drawing",
            charset=None,
            language="en",
            extra_metadata={
                "dc:creator": "Robert Frost",
                "dc:title": title,
                "visio:page-count": str(len(vsdx_pages)),
            },
            claimed_lang="en",
        )
    psd_w, psd_h = rng.randint(64, 2048), rng.randint(64, 2048)
    b.add(
        "psd",
        docgen.build_psd(psd_w, psd_h),
        content="",
        content_type="image/vnd.adobe.photoshop",
        media_type="image/vnd.adobe.photoshop",
        charset=None,
        language=None,
        extra_metadata={
            "Image Height": f"{psd_h} pixels",
            "Image Width": f"{psd_w} pixels",
        },
    )
    # real-pixel PSD composite (raw + PackBits-RLE image data) — decoded
    # for real by the multimodal pipeline (stages/codecs.psd_decode)
    for k in range(2):
        pw, ph = 40 + 8 * k, 56 - 8 * k
        psd_src = docgen.gradient_pixels(ph, pw, seed=61 + k)
        b.add(
            "psd-pixels",
            docgen.build_psd_pixels(psd_src, rle=bool(k)),
            content="",
            content_type="image/vnd.adobe.photoshop",
            media_type="image/vnd.adobe.photoshop",
            charset=None,
            language=None,
            extra_metadata={
                "Image Height": f"{ph} pixels",
                "Image Width": f"{pw} pixels",
            },
            img_means=_image_golden_means(psd_src),
        )
    # real-pixel ICO (32-bit BMP-DIB entry) — decoded for real
    # (stages/codecs.ico_decode)
    ico_src = docgen.gradient_pixels(32, 32, seed=77)
    b.add(
        "ico-pixels",
        docgen.build_ico_pixels(ico_src),
        content="",
        content_type="image/vnd.microsoft.icon",
        media_type="image/vnd.microsoft.icon",
        charset=None,
        language=None,
        extra_metadata={
            "Image Height": "32 pixels",
            "Image Width": "32 pixels",
        },
        img_means=_image_golden_means(ico_src),
    )
    # real-pixel lossless WebP (VP8L) — decoded for real
    # (stages/codecs.vp8l_decode)
    webp_src = docgen.gradient_pixels(40, 44, seed=83)
    b.add(
        "webp-pixels",
        docgen.build_webp_lossless(webp_src),
        content="",
        content_type="image/webp",
        media_type="image/webp",
        charset=None,
        language=None,
        extra_metadata={
            "Image Height": "40 pixels",
            "Image Width": "44 pixels",
        },
        img_means=_image_golden_means(webp_src),
    )
    # real Motion-JPEG AVI (engine codec: per-frame baseline JPEG) —
    # decoded for real by the video pipeline (decode_video_frames)
    import numpy as np

    for k, (avi_n, avi_fps, avi_h, avi_w) in enumerate(
        [(14, 7, 24, 32), (9, 12, 16, 20)]
    ):
        avi_frames = np.stack(
            [
                docgen.gradient_pixels(avi_h, avi_w, seed=200 + 20 * k + i)
                for i in range(avi_n)
            ]
        )
        avi_blob = docgen.build_avi_mjpeg(avi_frames, fps=avi_fps)
        b.add(
            "avi",
            avi_blob,
            content="",
            content_type="video/x-msvideo",
            media_type="video/x-msvideo",
            charset=None,
            language=None,
            extra_metadata={
                "tiff:ImageWidth": str(avi_w),
                "tiff:ImageLength": str(avi_h),
                "xmpDM:videoFrameCount": str(avi_n),
                "xmpDM:duration": f"{avi_n / avi_fps:.2f}",
            },
            video_feats=_video_golden_feats(avi_blob),
        )

    # --- eml / mbox: RFC 5322 mail (Tika RFC822Parser / MboxParser
    # surface) — multipart/alternative collapses to the plain member,
    # text attachments extract through the same dispatch, quoted-printable
    # UTF-8 decodes, mailbox messages concatenate in order
    def _eml_meta(subject, sender, to, mid, n_parts):
        return {
            "Message:From": sender,
            "Message:To": to,
            "Message:Message-ID": mid,
            "Message:Date": "Mon, 12 Jan 2026 10:00:00 +0000",
            "dc:title": subject,
            "dc:creator": sender,
            "Message:num-parts": str(n_parts),
        }

    for k in range(max(2, n_per_family)):
        subject = rng.choice(ARTICLE_TOPICS)
        sender = f"sender{k}@corpus.test"
        to = f"list{k}@corpus.test"
        mid = f"<gen-{k:04d}@corpus.test>"
        body = "".join(
            _sentence(rng, WORD_POOL["en"], rng.randint(6, 12)) + "\n"
            for _ in range(rng.randint(2, 4))
        )
        if k % 2 == 0:
            # multipart/alternative: html member present, plain preferred
            html_body = "<html><body><p>" + body.replace("\n", " ") + "</p></body></html>"
            payload = docgen.build_eml(
                subject, sender, to, body, html_body=html_body,
                message_id=mid,
            )
            expected_content, n_parts = body, 1
        else:
            att_text = _sentence(rng, WORD_POOL["en"], rng.randint(8, 14)) + "\n"
            payload = docgen.build_eml(
                subject, sender, to, body, message_id=mid,
                attachments=[("notes.txt", att_text.encode(), "text/plain")],
            )
            expected_content, n_parts = body + att_text, 2
        b.add(
            "eml",
            payload,
            content=expected_content,
            content_type="message/rfc822",
            media_type="message/rfc822",
            charset=None,
            language="en",
            extra_metadata=_eml_meta(subject, sender, to, mid, n_parts),
            claimed_lang="en",
        )
    # quoted-printable UTF-8 body (German umlauts force the qp branch)
    qp_subject = rng.choice(ARTICLE_TOPICS)
    qp_body = "".join(
        _sentence(rng, WORD_POOL["de"], rng.randint(6, 12)) + "\n"
        for _ in range(3)
    )
    b.add(
        "eml",
        docgen.build_eml(
            qp_subject, "gruss@corpus.test", "liste@corpus.test", qp_body,
            message_id="<gen-qp@corpus.test>",
        ),
        content=qp_body,
        content_type="message/rfc822",
        media_type="message/rfc822",
        charset=None,
        language="de",
        extra_metadata=_eml_meta(
            qp_subject, "gruss@corpus.test", "liste@corpus.test",
            "<gen-qp@corpus.test>", 1,
        ),
        claimed_lang="de",
    )
    for k in range(max(2, n_per_family)):
        msgs, contents = [], []
        first_hdr = None
        for j in range(rng.randint(2, 3)):
            subject = rng.choice(ARTICLE_TOPICS)
            sender = f"writer{j}@corpus.test"
            mid = f"<mbox-{k:03d}-{j}@corpus.test>"
            body = "".join(
                _sentence(rng, WORD_POOL["en"], rng.randint(6, 12)) + "\n"
                for _ in range(rng.randint(2, 3))
            )
            msgs.append(
                docgen.build_eml(
                    subject, sender, "all@corpus.test", body, message_id=mid
                )
            )
            contents.append(body)
            if first_hdr is None:
                first_hdr = _eml_meta(
                    subject, sender, "all@corpus.test", mid, 1
                )
        md = dict(first_hdr)
        md.pop("Message:num-parts")
        md["mbox:message-count"] = str(len(msgs))
        b.add(
            "mbox",
            docgen.build_mbox(msgs),
            content="".join(contents),
            content_type="application/mbox",
            media_type="application/mbox",
            charset=None,
            language="en",
            extra_metadata=md,
            claimed_lang="en",
        )

    # --- msg: Outlook CFB mail ([MS-OXMSG] property streams) — routed by
    # the same OLE2 directory inspection as DOC/XLS/PPT
    for k in range(max(2, n_per_family)):
        subject = rng.choice(ARTICLE_TOPICS)
        sender = f"Olivia Chen <olivia{k}@corpus.test>"
        to = f"staff{k}@corpus.test"
        body = "".join(
            _sentence(rng, WORD_POOL["en"], rng.randint(6, 12)) + "\n"
            for _ in range(rng.randint(2, 4))
        )
        b.add(
            "msg",
            docgen.build_msg(subject, sender, to, body),
            content=body,
            content_type="application/vnd.ms-outlook",
            media_type="application/vnd.ms-outlook",
            charset=None,
            language="en",
            extra_metadata={
                "dc:title": subject,
                "Message:From": sender,
                "Message:To": to,
                "dc:creator": sender,
            },
            claimed_lang="en",
        )

    # --- ics / vcf: iCalendar and vCard (Tika mime-magic BEGIN: detection,
    # text-parser passthrough) — content IS the text, component shape in
    # metadata like csv:*
    for k in range(max(2, n_per_family)):
        n_events = 2 + (k % 2)
        summaries = [
            _sentence(rng, WORD_POOL["en"], rng.randint(5, 8)).rstrip(".")
            for _ in range(n_events)
        ]
        descs = [
            _sentence(rng, WORD_POOL["en"], rng.randint(8, 14))
            for _ in range(n_events)
        ]
        lines = ["BEGIN:VCALENDAR", "VERSION:2.0", "PRODID:-//corpus//EN"]
        for j in range(n_events):
            lines += [
                "BEGIN:VEVENT",
                f"UID:evt-{k:03d}-{j}@corpus.test",
                f"DTSTART:202601{10 + j:02d}T090000Z",
                f"SUMMARY:{summaries[j]}",
                f"DESCRIPTION:{descs[j]}",
                "END:VEVENT",
            ]
        lines.append("END:VCALENDAR")
        ics_text = "\r\n".join(lines) + "\r\n"
        b.add(
            "ics",
            ics_text.encode("utf-8"),
            content=ics_text,
            content_type="text/calendar; charset=UTF-8",
            media_type="text/calendar",
            charset="UTF-8",
            language="en",
            extra_metadata={
                "Content-Encoding": "UTF-8",
                "ical:version": "2.0",
                "ical:num-events": str(n_events),
                "dc:title": summaries[0],
            },
            claimed_lang="en",
        )

    for k in range(max(2, n_per_family)):
        n_cards = 1 + (k % 2)
        names = [
            " ".join(rng.choice(WORD_POOL["en"]).title() for _ in range(2))
            for _ in range(n_cards)
        ]
        lines = []
        for j in range(n_cards):
            note = _sentence(rng, WORD_POOL["en"], rng.randint(8, 14))
            lines += [
                "BEGIN:VCARD",
                "VERSION:4.0",
                f"FN:{names[j]}",
                f"ORG:Corpus Research Group {j}",
                f"EMAIL:card{k}{j}@corpus.test",
                f"NOTE:{note}",
                "END:VCARD",
            ]
        vcf_text = "\r\n".join(lines) + "\r\n"
        b.add(
            "vcf",
            vcf_text.encode("utf-8"),
            content=vcf_text,
            content_type="text/vcard; charset=UTF-8",
            media_type="text/vcard",
            charset="UTF-8",
            language="en",
            extra_metadata={
                "Content-Encoding": "UTF-8",
                "vcard:num-cards": str(n_cards),
                "dc:title": names[0],
            },
            claimed_lang="en",
        )

    # --- css / js: code text, detected by resource name within the text
    # supertype (Tika DefaultDetector glob: *.css → text/css, *.js →
    # application/javascript) and extracted by the plain-text parser
    for k in range(max(2, n_per_family)):
        comment = _sentence(rng, WORD_POOL["en"], rng.randint(10, 16))
        css_text = (
            f"/* {comment} */\n"
            "body { margin: 0; font-family: serif; }\n"
            f".panel-{k} {{ padding: {4 + k}px; color: #333; }}\n"
            "a:hover { text-decoration: underline; }\n"
        )
        b.add(
            "css",
            css_text.encode("utf-8"),
            content=css_text,
            content_type="text/css; charset=UTF-8",
            media_type="text/css",
            charset="UTF-8",
            language="en",
            extra_metadata={"Content-Encoding": "UTF-8"},
            url=f"https://fixtures.test/css/{k:06d}/site.css",
        )
        js_comment = _sentence(rng, WORD_POOL["en"], rng.randint(10, 16))
        ext = ".mjs" if k % 2 else ".js"
        js_text = (
            f"// {js_comment}\n"
            f"export function renderPanel{k}(el) {{\n"
            f"  el.textContent = 'panel {k}';\n"
            "  return el;\n"
            "}\n"
        )
        b.add(
            "js",
            js_text.encode("utf-8"),
            content=js_text,
            content_type="application/javascript; charset=UTF-8",
            media_type="application/javascript",
            charset="UTF-8",
            language="en",
            extra_metadata={"Content-Encoding": "UTF-8"},
            url=f"https://fixtures.test/js/{k:06d}/app{ext}",
        )

    # --- wav / flac: real-PCM audio (decoded for real by the multimodal
    # pipeline — rika_ray.stages.codecs); metadata per the Tika
    # AudioParser convention (empty content, XMPDM keys)
    for k in range(max(4, min(n_per_family, 8))):
        wav_rate, wav_secs = rng.choice(
            [(22050, 1), (44100, 2), (48000, 1)]
        ), rng.randint(1, 3)
        wav_pcm = docgen.tone_samples(
            wav_rate[0] * wav_secs, wav_rate[0], wav_rate[1], seed=41 + k
        )
        wav_blob = docgen.build_wav(
            wav_rate[0], wav_rate[1], 16, samples=wav_pcm
        )
        b.add(
            "wav",
            wav_blob,
            content="",
            content_type="audio/vnd.wave",
            media_type="audio/vnd.wave",
            charset=None,
            language=None,
            extra_metadata={
                "xmpDM:audioSampleRate": str(wav_rate[0]),
                "xmpDM:audioChannelType": "Mono" if wav_rate[1] == 1 else "Stereo",
                "bits": "16",
                "xmpDM:duration": f"{wav_secs:.2f}",
            },
            audio_feats=_audio_golden_feats(wav_blob),
        )
        flac_rate = rng.choice([44100, 48000])
        flac_secs = rng.randint(1, 3)
        # REAL native FLAC (engine codec): stereo tone, decorrelation mode
        # cycled so the production pipeline exercises every reconstruction
        flac_mode = ["independent", "left-side", "right-side", "mid-side"][k % 4]
        flac_blob = docgen.build_flac_pcm(
            docgen.tone_samples(flac_rate * flac_secs, flac_rate, 2, seed=97 + k),
            flac_rate,
            stereo_mode=flac_mode,
        )
        b.add(
            "flac",
            flac_blob,
            content="",
            content_type="audio/x-flac",
            media_type="audio/x-flac",
            charset=None,
            language=None,
            extra_metadata={
                "xmpDM:audioSampleRate": str(flac_rate),
                "xmpDM:audioChannelType": "Stereo",
                "bits": "16",
                "xmpDM:duration": f"{flac_secs:.2f}",
            },
            audio_feats=_audio_golden_feats(flac_blob),
        )

    # --- ogg / mp4 / ico: metadata-only media formats
    ogg_rate = rng.choice([22050, 44100])
    b.add(
        "ogg",
        docgen.build_ogg_vorbis(ogg_rate, 1),
        content="",
        content_type="audio/ogg",
        media_type="audio/ogg",
        charset=None,
        language=None,
        extra_metadata={
            "xmpDM:audioSampleRate": str(ogg_rate),
            "xmpDM:audioChannelType": "Mono",
            "ogg:codec": "vorbis",
        },
    )
    mp4_w, mp4_h = rng.choice([(640, 360), (1280, 720), (1920, 1080)])
    mp4_dur = rng.randint(5, 300)
    b.add(
        "mp4",
        docgen.build_mp4(float(mp4_dur), mp4_w, mp4_h),
        content="",
        content_type="video/mp4",
        media_type="video/mp4",
        charset=None,
        language=None,
        extra_metadata={
            "mp4:major-brand": "isom",
            "xmpDM:duration": f"{mp4_dur:.2f}",
            "tiff:ImageWidth": str(mp4_w),
            "tiff:ImageLength": str(mp4_h),
        },
    )
    ico_side = rng.choice([16, 32, 48])
    b.add(
        "ico",
        docgen.build_ico(ico_side, ico_side),
        content="",
        content_type="image/vnd.microsoft.icon",
        media_type="image/vnd.microsoft.icon",
        charset=None,
        language=None,
        extra_metadata={
            "Image Height": f"{ico_side} pixels",
            "Image Width": f"{ico_side} pixels",
        },
    )

    # --- epub: OCF/OPF ebook package (mimetype-anchored detection like
    # ODF; spine-ordered XHTML chapters)
    for _ in range(max(2, n_per_family)):
        chapters = [
            [
                _paragraph(rng, WORD_POOL["en"], rng.randint(2, 3))
                for _ in range(rng.randint(2, 3))
            ]
            for _ in range(rng.randint(1, 3))
        ]
        title = rng.choice(ARTICLE_TOPICS)
        payload = docgen.build_epub(chapters, title=title, creator="Robert Frost")
        b.add(
            "epub",
            payload,
            content=docgen.expected_epub_content(chapters),
            content_type="application/epub+zip",
            media_type="application/epub+zip",
            charset=None,
            language="en",
            extra_metadata={"dc:creator": "Robert Frost", "dc:title": title},
            claimed_lang="en",
        )

    # --- xls: legacy Excel binary (CFB + BIFF8 SST; OLE2 container sniff
    # refined to application/vnd.ms-excel by directory stream names)
    for _ in range(max(2, n_per_family)):
        cells = [
            _sentence(rng, WORD_POOL["en"], rng.randint(6, 10))
            for _ in range(rng.randint(3, 5))
        ]
        payload = docgen.build_xls(cells)
        b.add(
            "xls",
            payload,
            content=docgen.expected_xls_content(cells),
            content_type="application/vnd.ms-excel",
            media_type="application/vnd.ms-excel",
            charset=None,
            language="en",
            claimed_lang="en",
        )

    # --- ppt: legacy PowerPoint binary (CFB record tree; text atoms mix
    # cp1252 TextBytesAtom and UTF-16 TextCharsAtom)
    for _ in range(max(2, n_per_family)):
        slides = [
            [
                _sentence(rng, WORD_POOL["en"], rng.randint(5, 9))
                for _ in range(rng.randint(2, 3))
            ]
            for _ in range(rng.randint(1, 3))
        ]
        payload = docgen.build_ppt(slides)
        b.add(
            "ppt",
            payload,
            content=docgen.expected_ppt_content(slides),
            content_type="application/vnd.ms-powerpoint",
            media_type="application/vnd.ms-powerpoint",
            charset=None,
            language="en",
            claimed_lang="en",
        )

    # --- mp3: ID3v2-tagged audio (empty content, XMPDM metadata) + one
    # tagless frame-sync-only stream
    for k in range(max(2, n_per_family)):
        title = rng.choice(ARTICLE_TOPICS)
        payload = docgen.build_mp3(
            title=title, artist="The Woods", album="Snowy Evening", genre="Folk"
        )
        b.add(
            "mp3",
            payload,
            content="",
            content_type="audio/mpeg",
            media_type="audio/mpeg",
            charset=None,
            language=None,
            extra_metadata={
                "dc:title": title,
                "xmpDM:artist": "The Woods",
                "xmpDM:album": "Snowy Evening",
                "xmpDM:genre": "Folk",
            },
        )
    b.add(
        "mp3-bare",
        docgen.build_mp3_bare(),
        content="",
        content_type="audio/mpeg",
        media_type="audio/mpeg",
        charset=None,
        language=None,
    )

    # --- gzip members: transparent unwrap (crawl corpora carry .gz
    # payloads); media_type refines to the INNER type, the container is
    # recorded as rika:container metadata
    import gzip as _gzip

    for k in range(max(2, n_per_family)):
        gen = _paragraph(rng, WORD_POOL["en"], rng.randint(3, 6)) + "\n"
        b.add(
            "gzip-text",
            _gzip.compress(gen.encode("utf-8"), mtime=0),
            content=gen,
            content_type="text/plain; charset=UTF-8",
            media_type="text/plain",
            charset="UTF-8",
            language="en",
            extra_metadata={
                "Content-Encoding": "UTF-8",
                "rika:container": "application/gzip",
            },
            claimed_lang="en",
        )
    for _ in range(max(2, n_per_family)):
        title = rng.choice(ARTICLE_TOPICS)
        paras = [
            _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5))
            for _ in range(rng.randint(3, 5))
        ]
        payload = docgen.build_html_page(title, paras, rng.sample(NAV_LINKS, 8))
        b.add(
            "gzip-html",
            _gzip.compress(payload, mtime=0),
            content=docgen.expected_html_content(paras),
            content_type="text/html; charset=UTF-8",
            media_type="text/html",
            charset="UTF-8",
            language="en",
            extra_metadata={
                "Content-Encoding": "UTF-8",
                "dc:title": title,
                "rika:container": "application/gzip",
            },
            claimed_lang="en",
        )
    # corrupt gzip member → parse_error row, run continues
    b.add(
        "corrupt-gzip",
        b"\x1f\x8b\x08\x00" + bytes(rng.getrandbits(8) for _ in range(64)),
        content=None,
        content_type=None,
        media_type="application/gzip",
        charset=None,
        language=None,
        error_type="parse_error",
    )

    # --- zip / tar archives: embedded members auto-detected and parsed,
    # texts concatenated in archive order (Tika PackageParser semantics);
    # media_type stays the container's, member tally in metadata
    for _ in range(max(2, n_per_family)):
        t1 = _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5)) + "\n"
        t2 = _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5)) + "\n"
        title = rng.choice(ARTICLE_TOPICS)
        paras = [
            _paragraph(rng, WORD_POOL["en"], rng.randint(2, 4))
            for _ in range(rng.randint(2, 3))
        ]
        html_payload = docgen.build_html_page(
            title, paras, rng.sample(NAV_LINKS, 8)
        )
        payload = docgen.build_zip(
            [
                ("docs/a.txt", t1.encode("utf-8")),
                ("docs/b.txt", t2.encode("utf-8")),
                ("pages/index.html", html_payload),
            ]
        )
        html_content = docgen.expected_html_content(paras)
        b.add(
            "zip-archive",
            payload,
            content=t1 + t2 + html_content + "\n",
            content_type="application/zip",
            media_type="application/zip",
            charset=None,
            language="en",
            extra_metadata={
                "rika:container": "application/zip",
                "rika:entry-count": "3",
            },
            claimed_lang="en",
        )
    for _ in range(max(2, n_per_family)):
        t1 = _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5)) + "\n"
        t2 = _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5)) + "\n"
        tar_payload = docgen.build_tar(
            [("a.txt", t1.encode("utf-8")), ("b.txt", t2.encode("utf-8"))]
        )
        b.add(
            "tar-archive",
            tar_payload,
            content=t1 + t2,
            content_type="application/x-tar",
            media_type="application/x-tar",
            charset=None,
            language="en",
            extra_metadata={
                "rika:container": "application/x-tar",
                "rika:entry-count": "2",
            },
            claimed_lang="en",
        )
        # .tar.gz: gzip unwrap refines to the tar, container records the
        # CHAIN outermost-first
        b.add(
            "tgz-archive",
            _gzip.compress(tar_payload, mtime=0),
            content=t1 + t2,
            content_type="application/x-tar",
            media_type="application/x-tar",
            charset=None,
            language="en",
            extra_metadata={
                "rika:container": "application/gzip,application/x-tar",
                "rika:entry-count": "2",
            },
            claimed_lang="en",
        )
    # .tar.bz2 / .tar.xz: the other stdlib compressors unwrap through the
    # same bounded path; chain records outermost-first
    import bz2 as _bz2
    import lzma as _lzma

    t1 = _paragraph(rng, WORD_POOL["en"], 4) + "\n"
    tar_payload = docgen.build_tar([("only.txt", t1.encode("utf-8"))])
    for comp_name, comp_media, comp in (
        ("tbz2", "application/x-bzip2", _bz2.compress),
        ("txz", "application/x-xz", _lzma.compress),
    ):
        b.add(
            f"{comp_name}-archive",
            comp(tar_payload),
            content=t1,
            content_type="application/x-tar",
            media_type="application/x-tar",
            charset=None,
            language="en",
            extra_metadata={
                "rika:container": f"{comp_media},application/x-tar",
                "rika:entry-count": "1",
            },
            claimed_lang="en",
        )

    # 7z / RAR / zstd: REAL member extraction through the from-scratch
    # readers (stages/sevenz.py, rar.py, zstd.py — Tika PackageParser /
    # CompressorParser parity for the long-tail package formats)
    for _ in range(max(2, n_per_family)):
        t1 = _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5)) + "\n"
        t2 = _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5)) + "\n"
        codec = rng.choice(["copy", "lzma2", "lzma1", "bzip2"])
        b.add(
            "sevenz",
            docgen.build_7z(
                [
                    ("docs/a.txt", t1.encode("utf-8")),
                    ("docs/b.txt", t2.encode("utf-8")),
                ],
                codec=codec,
                encoded_header=bool(rng.getrandbits(1)),
            ),
            content=t1 + t2,
            content_type="application/x-7z-compressed",
            media_type="application/x-7z-compressed",
            charset=None,
            language="en",
            extra_metadata={
                "rika:container": "application/x-7z-compressed",
                "rika:entry-count": "2",
            },
            claimed_lang="en",
        )
    for _ in range(max(2, n_per_family)):
        t1 = _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5)) + "\n"
        builder = docgen.build_rar5 if rng.getrandbits(1) else docgen.build_rar4
        b.add(
            "rar",
            builder([("stored.txt", t1.encode("utf-8"))]),
            content=t1,
            content_type="application/x-rar-compressed",
            media_type="application/x-rar-compressed",
            charset=None,
            language="en",
            extra_metadata={
                "rika:container": "application/x-rar-compressed",
                "rika:entry-count": "1",
            },
            claimed_lang="en",
        )
    for _ in range(max(2, n_per_family)):
        gen = _paragraph(rng, WORD_POOL["en"], rng.randint(4, 6)) + "\n"
        b.add(
            "zstd-text",
            docgen.build_zstd_raw(gen.encode("utf-8")),
            content=gen,
            content_type="text/plain; charset=UTF-8",
            media_type="text/plain",
            charset="UTF-8",
            language="en",
            extra_metadata={
                "Content-Encoding": "UTF-8",
                "rika:container": "application/zstd",
            },
            claimed_lang="en",
        )
    # truncated 7z → parse_error row, run continues (same convention as
    # corrupt-zip/corrupt-gzip below)
    b.add(
        "corrupt-7z",
        b"7z\xbc\xaf\x27\x1c" + bytes(rng.getrandbits(8) for _ in range(48)),
        content=None,
        content_type=None,
        media_type="application/x-7z-compressed",
        charset=None,
        language=None,
        error_type="parse_error",
    )

    # zip-in-zip: nested members extract through the same dispatch with
    # bounded depth
    inner_t = _paragraph(rng, WORD_POOL["en"], 4) + "\n"
    top_t = _paragraph(rng, WORD_POOL["en"], 4) + "\n"
    inner_zip = docgen.build_zip([("deep.txt", inner_t.encode("utf-8"))])
    b.add(
        "zip-nested",
        docgen.build_zip(
            [("inner.zip", inner_zip), ("top.txt", top_t.encode("utf-8"))]
        ),
        content=inner_t + top_t,
        content_type="application/zip",
        media_type="application/zip",
        charset=None,
        language="en",
        extra_metadata={
            "rika:container": "application/zip",
            "rika:entry-count": "2",
        },
        claimed_lang="en",
    )
    # corrupt zip (no central directory) → parse_error row, run continues
    b.add(
        "corrupt-zip",
        b"PK\x03\x04" + bytes(rng.getrandbits(8) for _ in range(64)),
        content=None,
        content_type=None,
        media_type="application/zip",
        charset=None,
        language=None,
        error_type="parse_error",
    )

    # --- encrypted PDF → typed encrypted_document error (Tika
    # EncryptedDocumentException analogue), never a text-recovery attempt
    b.add(
        "pdf-encrypted",
        docgen.build_pdf_encrypted([["This text must not be extracted."]]),
        content=None,
        content_type=None,
        media_type="application/pdf",
        charset=None,
        language=None,
        error_type="encrypted_document",
    )

    # --- ole2 container with no WordDocument stream → empty content
    bare_ole = docgen.build_doc(["x"])
    # corrupt the directory name so the WordDocument stream isn't found
    bare_ole = bare_ole.replace(
        "WordDocument".encode("utf-16-le"), "SomethingElse".encode("utf-16-le")
    )
    b.add(
        "ole2-bare",
        bare_ole,
        content="",
        content_type="application/x-ole-storage",
        media_type="application/x-ole-storage",
        charset=None,
        language=None,
    )

    # --- images: jpeg (incl. "extension-less" URL), png, gif — all
    # real-pixel fixtures now (rika_ray.stages.codecs decodes them for
    # real); golden means are computed from a reference decode where the
    # codec is lossy (JPEG) and from the source where it is not
    jpeg_src = docgen.gradient_pixels(72, 72, seed=31)
    jpeg = docgen.build_jpeg_rgb(jpeg_src, quality=90)
    for url_suffix in ("image.jpg", "image_without_extension"):
        b.add(
            "jpeg",
            jpeg,
            content="",
            content_type="image/jpeg",
            media_type="image/jpeg",
            charset=None,
            language=None,
            extra_metadata={
                "Image Height": "72 pixels",
                "Image Width": "72 pixels",
            },
            url=f"https://fixtures.test/jpeg/{url_suffix}",
            img_means=_image_golden_means_jpeg(jpeg),
        )
    # EXIF-bearing JPEG: IFD0 tags surface as tiff:/exif: metadata keys
    jpeg_exif_src = docgen.gradient_pixels(480, 640, seed=32)
    jpeg_exif = docgen.build_jpeg_exif_rgb(
        jpeg_exif_src, make="Acme", model="Shutter 9", orientation=6,
        datetime="2020:01:02 03:04:05",
    )
    b.add(
        "jpeg-exif",
        jpeg_exif,
        content="",
        content_type="image/jpeg",
        media_type="image/jpeg",
        charset=None,
        language=None,
        extra_metadata={
            "Image Height": "480 pixels",
            "Image Width": "640 pixels",
            "tiff:Make": "Acme",
            "tiff:Model": "Shutter 9",
            "tiff:Orientation": "6",
            "exif:DateTime": "2020:01:02 03:04:05",
        },
        img_means=_image_golden_means_jpeg(jpeg_exif),
    )
    # real pixel data (deterministic gradient) with every PNG filter type
    # in play — the multimodal pipeline REALLY decodes these (codecs.py)
    png_src = docgen.gradient_pixels(48, 64, seed=3)
    b.add(
        "png",
        docgen.build_png_rgb(png_src, filters=[y % 5 for y in range(48)]),
        content="",
        content_type="image/png",
        media_type="image/png",
        charset=None,
        language=None,
        extra_metadata={"Image Height": "48 pixels", "Image Width": "64 pixels"},
        img_means=_image_golden_means(png_src),
    )
    tiff_src = docgen.gradient_pixels(100, 200, seed=33)
    b.add(
        "tiff",
        docgen.build_tiff_rgb(
            tiff_src, make="Acme", packbits=True, rows_per_strip=16
        ),
        content="",
        content_type="image/tiff",
        media_type="image/tiff",
        charset=None,
        language=None,
        extra_metadata={
            "Image Height": "100 pixels",
            "Image Width": "200 pixels",
            "tiff:Make": "Acme",
        },
        img_means=_image_golden_means(tiff_src),
    )
    bmp_src = docgen.gradient_pixels(30, 40, seed=9)
    b.add(
        "bmp",
        docgen.build_bmp_rgb(bmp_src),
        content="",
        content_type="image/bmp",
        media_type="image/bmp",
        charset=None,
        language=None,
        extra_metadata={"Image Height": "30 pixels", "Image Width": "40 pixels"},
        img_means=_image_golden_means(bmp_src),
    )
    b.add(
        "webp",
        docgen.build_webp(256, 128),
        content="",
        content_type="image/webp",
        media_type="image/webp",
        charset=None,
        language=None,
        extra_metadata={
            "Image Height": "128 pixels",
            "Image Width": "256 pixels",
        },
    )
    gif_src = (docgen.gradient_pixels(16, 32, seed=34) // 32) * 32  # ≤256 colors
    b.add(
        "gif",
        docgen.build_gif_rgb(gif_src),
        content="",
        content_type="image/gif",
        media_type="image/gif",
        charset=None,
        language=None,
        extra_metadata={"Image Height": "16 pixels", "Image Width": "32 pixels"},
        img_means=_image_golden_means(gif_src),
    )

    # --- png-grad / bmp-grad: scaled real-pixel variants whose decoded
    # channel means are generator-computable ground truth — the corpus
    # side of the image_features_decoded oracle (codec round-trip pinned
    # at the driver level, not just in pytest)
    for k in range(max(2, n_per_family)):
        gh, gw = 8 + (k % 5) * 4, 12 + (k % 7) * 4
        src = docgen.gradient_pixels(gh, gw, seed=100 + k)
        b.add(
            "png-grad",
            docgen.build_png_rgb(src, filters=[(y + k) % 5 for y in range(gh)]),
            content="",
            content_type="image/png",
            media_type="image/png",
            charset=None,
            language=None,
            extra_metadata={
                "Image Height": f"{gh} pixels",
                "Image Width": f"{gw} pixels",
            },
            img_means=_image_golden_means(src),
        )
        bh, bw = 6 + (k % 4) * 3, 10 + (k % 5) * 3
        src = docgen.gradient_pixels(bh, bw, seed=200 + k)
        b.add(
            "bmp-grad",
            docgen.build_bmp_rgb(src),
            content="",
            content_type="image/bmp",
            media_type="image/bmp",
            charset=None,
            language=None,
            extra_metadata={
                "Image Height": f"{bh} pixels",
                "Image Width": f"{bw} pixels",
            },
            img_means=_image_golden_means(src),
        )
        # gif/tiff/jpeg variants: the round-5 real codecs (LZW, PackBits
        # strips, baseline Huffman+IDCT) under the same driver oracle
        gh2, gw2 = 9 + (k % 4) * 5, 11 + (k % 6) * 5
        # 8 levels/channel keeps every size under the 256-color GIF cap
        src = (docgen.gradient_pixels(gh2, gw2, seed=300 + k) // 32) * 32
        b.add(
            "gif-grad",
            docgen.build_gif_rgb(src),
            content="",
            content_type="image/gif",
            media_type="image/gif",
            charset=None,
            language=None,
            extra_metadata={
                "Image Height": f"{gh2} pixels",
                "Image Width": f"{gw2} pixels",
            },
            img_means=_image_golden_means(src),
        )
        th, tw = 7 + (k % 5) * 4, 13 + (k % 4) * 6
        src = docgen.gradient_pixels(th, tw, seed=400 + k)
        b.add(
            "tiff-grad",
            docgen.build_tiff_rgb(
                src, packbits=bool(k % 2), rows_per_strip=3 + (k % 4)
            ),
            content="",
            content_type="image/tiff",
            media_type="image/tiff",
            charset=None,
            language=None,
            extra_metadata={
                "Image Height": f"{th} pixels",
                "Image Width": f"{tw} pixels",
            },
            img_means=_image_golden_means(src),
        )
        jh, jw = 16 + (k % 3) * 8, 24 + (k % 4) * 8
        jp = docgen.build_jpeg_rgb(
            docgen.gradient_pixels(jh, jw, seed=500 + k),
            quality=(60, 75, 90, 95)[k % 4],
        )
        b.add(
            "jpeg-grad",
            jp,
            content="",
            content_type="image/jpeg",
            media_type="image/jpeg",
            charset=None,
            language=None,
            extra_metadata={
                "Image Height": f"{jh} pixels",
                "Image Width": f"{jw} pixels",
            },
            img_means=_image_golden_means_jpeg(jp),
        )

    # --- csv / tsv: delimiter-consistency content sniff (Tika
    # TextAndCSVParser analogue); content passes through, table shape in
    # metadata. Cells are comma/tab-free by construction.
    for delim, media, dname, fam in (
        (",", "text/csv", "comma", "csv"),
        ("\t", "text/tab-separated-values", "tab", "tsv"),
    ):
        for k in range(max(2, n_per_family)):
            rows = [["id", "name", "notes"]]
            for r in range(5 + (k % 3)):
                name_w = " ".join(
                    rng.choice(WORD_POOL["en"]) for _ in range(2)
                )
                notes_w = " ".join(
                    rng.choice(WORD_POOL["en"]) for _ in range(7)
                )
                rows.append([str(100 + r), name_w, notes_w])
            text = "\n".join(delim.join(cells) for cells in rows) + "\n"
            b.add(
                fam,
                text.encode("utf-8"),
                content=text,
                content_type=f"{media}; charset=UTF-8",
                media_type=media,
                charset="UTF-8",
                language="en",
                extra_metadata={
                    "Content-Encoding": "UTF-8",
                    "csv:delimiter": dname,
                    "csv:num-rows": str(len(rows)),
                    "csv:num-columns": "3",
                },
            )

    # --- csv name hint: too few lines for the content sniff — the .csv
    # resource name refines text/plain (Tika DefaultDetector name+magic
    # composition; the name only ever refines WITHIN the text supertype)
    hint_text = "id,name\n1,alpha\n"
    b.add(
        "csv-hint",
        hint_text.encode("utf-8"),
        content=hint_text,
        content_type="text/csv; charset=UTF-8",
        media_type="text/csv",
        charset="UTF-8",
        language=None,  # too short to determine
        extra_metadata={
            "Content-Encoding": "UTF-8",
            "csv:delimiter": "comma",
            "csv:num-rows": "2",
            "csv:num-columns": "2",
        },
        url="https://fixtures.test/csv-hint/table.csv",
    )

    # --- json / ndjson: brace-led structural sniff; content passes
    # through (Tika has no structural JSON parser), validity + shape in
    # metadata
    import json as _json

    for k in range(max(2, n_per_family)):
        obj = {
            "title": rng.choice(ARTICLE_TOPICS),
            "body": _paragraph(rng, WORD_POOL["en"], 2),
            "tags": [rng.choice(WORD_POOL["en"]) for _ in range(2)],
            "views": 10 + k,
        }
        text = _json.dumps(obj, indent=2) + "\n"
        b.add(
            "json",
            text.encode("utf-8"),
            content=text,
            content_type="application/json; charset=UTF-8",
            media_type="application/json",
            charset="UTF-8",
            language="en",
            extra_metadata={
                "Content-Encoding": "UTF-8",
                "json:valid": "true",
                "json:num-keys": "4",
            },
        )
    for k in range(max(2, n_per_family)):
        n_rec = 4 + (k % 2)
        lines = [
            _json.dumps(
                {"id": i, "text": _sentence(rng, WORD_POOL["en"], 9)}
            )
            for i in range(n_rec)
        ]
        text = "\n".join(lines) + "\n"
        b.add(
            "ndjson",
            text.encode("utf-8"),
            content=text,
            content_type="application/x-ndjson; charset=UTF-8",
            media_type="application/x-ndjson",
            charset="UTF-8",
            language="en",
            extra_metadata={
                "Content-Encoding": "UTF-8",
                "ndjson:num-lines": str(n_rec),
                "ndjson:num-records": str(n_rec),
            },
        )

    # --- markdown: heading-led sniff; headings/bullets/emphasis/links
    # strip to plain text, first heading → dc:title
    for _ in range(max(2, n_per_family)):
        title = rng.choice(ARTICLE_TOPICS)
        p1 = _paragraph(rng, WORD_POOL["en"], 2)
        p2 = _sentence(rng, WORD_POOL["en"], 10)
        li1 = _sentence(rng, WORD_POOL["en"], 6)
        li2 = _sentence(rng, WORD_POOL["en"], 6)
        md = (
            f"# {title}\n\n{p1}\n\n## Details\n\n- {li1}\n- {li2}\n\n"
            f"**Summary** {p2} See [docs](https://example.test/docs) "
            f"and `code`.\n"
        )
        expected = (
            f"{title}\n\n{p1}\n\nDetails\n\n{li1}\n{li2}\n\n"
            f"Summary {p2} See docs and code.\n"
        )
        b.add(
            "markdown",
            md.encode("utf-8"),
            content=expected,
            content_type="text/markdown; charset=UTF-8",
            media_type="text/markdown",
            charset="UTF-8",
            language="en",
            extra_metadata={
                "Content-Encoding": "UTF-8",
                "md:num-headings": "2",
                "dc:title": title,
            },
        )

    # --- svg: XML-root sniff → image/svg+xml; content is the readable
    # text (title/desc/text with tspans flattened), dimensions in metadata
    for _ in range(max(2, n_per_family)):
        t_title = rng.choice(ARTICLE_TOPICS)
        desc = _sentence(rng, WORD_POOL["en"], 10)
        lbl = _sentence(rng, WORD_POOL["en"], 8)
        w1 = rng.choice(WORD_POOL["en"]).capitalize()
        w2 = rng.choice(WORD_POOL["en"])
        esc = docgen._xml_escape
        svg = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<svg xmlns="http://www.w3.org/2000/svg" width="320" height="200">\n'
            f"  <title>{esc(t_title)}</title>\n"
            f"  <desc>{esc(desc)}</desc>\n"
            f'  <text x="10" y="20">{esc(lbl)}</text>\n'
            f'  <text x="10" y="40"><tspan>{esc(w1)}</tspan> '
            f"<tspan>{esc(w2)}</tspan></text>\n"
            "</svg>\n"
        )
        b.add(
            "svg",
            svg.encode("utf-8"),
            content="\n".join([t_title, desc, lbl, f"{w1} {w2}"]) + "\n",
            content_type="image/svg+xml",
            media_type="image/svg+xml",
            charset=None,
            language="en",
            extra_metadata={
                "dc:title": t_title,
                "svg:width": "320",
                "svg:height": "200",
            },
        )

    # --- rss / atom feeds: XML-root sniff; content is feed title +
    # description then per-entry title + description/summary
    for _ in range(max(2, n_per_family)):
        ch_title = rng.choice(ARTICLE_TOPICS) + " Feed"
        ch_desc = _sentence(rng, WORD_POOL["en"], 8)
        items = [
            (
                _sentence(rng, WORD_POOL["en"], 5),
                _sentence(rng, WORD_POOL["en"], 12),
            )
            for _ in range(3)
        ]
        esc = docgen._xml_escape
        rss = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<rss version="2.0">\n<channel>\n'
            f"<title>{esc(ch_title)}</title>\n"
            f"<description>{esc(ch_desc)}</description>\n"
            + "".join(
                f"<item><title>{esc(t)}</title>"
                f"<description>{esc(d)}</description></item>\n"
                for t, d in items
            )
            + "</channel>\n</rss>\n"
        )
        content = (
            "\n".join(
                [ch_title, ch_desc] + [x for t, d in items for x in (t, d)]
            )
            + "\n"
        )
        b.add(
            "rss",
            rss.encode("utf-8"),
            content=content,
            content_type="application/rss+xml",
            media_type="application/rss+xml",
            charset=None,
            language="en",
            extra_metadata={
                "dc:title": ch_title,
                "feed:num-entries": "3",
            },
        )
    for _ in range(max(2, n_per_family)):
        f_title = rng.choice(ARTICLE_TOPICS) + " Updates"
        f_sub = _sentence(rng, WORD_POOL["en"], 8)
        entries = [
            (
                _sentence(rng, WORD_POOL["en"], 5),
                _sentence(rng, WORD_POOL["en"], 12),
            )
            for _ in range(2)
        ]
        esc = docgen._xml_escape
        atom = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<feed xmlns="http://www.w3.org/2005/Atom">\n'
            f"<title>{esc(f_title)}</title>\n"
            f"<subtitle>{esc(f_sub)}</subtitle>\n"
            + "".join(
                f"<entry><title>{esc(t)}</title>"
                f"<summary>{esc(s)}</summary></entry>\n"
                for t, s in entries
            )
            + "</feed>\n"
        )
        content = (
            "\n".join(
                [f_title, f_sub] + [x for t, s in entries for x in (t, s)]
            )
            + "\n"
        )
        b.add(
            "atom",
            atom.encode("utf-8"),
            content=content,
            content_type="application/atom+xml",
            media_type="application/atom+xml",
            charset=None,
            language="en",
            extra_metadata={
                "dc:title": f_title,
                "feed:num-entries": "2",
            },
        )

    # --- unknown binary → application/octet-stream, empty content
    # (same role as spec/fixtures/unknown.bin, bytes 00 00 30 39)
    for payload in (b"\x00\x00\x30\x39", b"\x00\x01\x02\x03\x04\x05"):
        b.add(
            "unknown",
            payload,
            content="",
            content_type="application/octet-stream",
            media_type="application/octet-stream",
            charset=None,
            language=None,
        )

    # --- empty docs → error rows, run continues
    for _ in range(2):
        b.add(
            "empty",
            b"",
            content=None,
            content_type=None,
            media_type=None,
            charset=None,
            language=None,
            error_type="empty_file",
        )

    # --- utf-16 text (BOM-marked; decode path M2/M3)
    for k in range(max(2, n_per_family)):
        gen = _paragraph(rng, WORD_POOL["en"], rng.randint(3, 5)) + "\n"
        enc = "utf-16-le" if k % 2 == 0 else "utf-16-be"
        bom = b"\xff\xfe" if k % 2 == 0 else b"\xfe\xff"
        cs = "UTF-16LE" if k % 2 == 0 else "UTF-16BE"
        b.add(
            "plain-utf16",
            bom + gen.encode(enc),
            content=gen,
            content_type=f"text/plain; charset={cs}",
            media_type="text/plain",
            charset=cs,
            language="en",
            extra_metadata={"Content-Encoding": cs},
            claimed_lang="en",
        )

    # --- tiny / language-undetermined
    for payload_text in ("hello", "hej"):
        b.add(
            "tiny",
            payload_text.encode("utf-8"),
            content=payload_text,
            content_type="text/plain; charset=UTF-8",
            media_type="text/plain",
            charset="UTF-8",
            language=None,  # too short to determine
            extra_metadata={"Content-Encoding": "UTF-8"},
        )

    # --- mega docs (multi-MB text; skew routing + truncation targets)
    for k in range(2):
        seed_para = _paragraph(rng, WORD_POOL["en"], 10) + "\n"
        reps = 4000 + 1000 * k  # ~1.5-2 MB
        mega = seed_para * reps
        b.add(
            "mega",
            mega.encode("utf-8"),
            content=mega,
            content_type="text/plain; charset=UTF-8",
            media_type="text/plain",
            charset="UTF-8",
            language="en",
            extra_metadata={"Content-Encoding": "UTF-8"},
            claimed_lang="en",
        )

    # --- duplicate url (duplicate targets are NOT deduped by default —
    # reference footgun documented at /root/reference/EXAMPLES.md:187-197)
    dup_text = FIXTURE_TEXT["en"]
    for _ in range(2):
        b.add(
            "dup",
            dup_text.encode("utf-8"),
            content=dup_text,
            content_type="text/plain; charset=UTF-8",
            media_type="text/plain",
            charset="UTF-8",
            language="en",
            extra_metadata={"Content-Encoding": "UTF-8"},
            url="https://fixtures.test/dup/000000",
        )

    # --- corrupt PDFs → parse_error rows, no abort (§2.8 error-as-data)
    for k in range(2):
        payload = b"%PDF-1.4\n" + bytes(rng.getrandbits(8) for _ in range(200 + k))
        b.add(
            "corrupt-pdf",
            payload,
            content=None,
            content_type=None,
            media_type="application/pdf",
            charset=None,
            language=None,
            error_type="parse_error",
        )

    # --- corrupt xref-stream PDFs: structurally modern but damaged
    # (truncated / predictor-row corruption) → parse_error
    good = docgen.build_pdf_xrefstream([["Corrupt target line."]])
    for payload in (
        good[: len(good) * 2 // 3],
        good.replace(b"/Predictor 12", b"/Predictor 99"),
    ):
        b.add(
            "corrupt-pdf",
            payload,
            content=None,
            content_type=None,
            media_type="application/pdf",
            charset=None,
            language=None,
            error_type="parse_error",
        )

    web_pages = pa.Table.from_pylist(b.pages, schema=WEB_PAGES_SCHEMA)
    expected = pa.Table.from_pylist(b.expected)
    return web_pages, expected


def write_corpus(
    out_dir: str, n_per_family: int = 3, seed: int = 42
) -> dict[str, str]:
    """Write web_pages.parquet + expected_extractions.parquet to out_dir.

    Small row groups (1024 rows) so ``read_parquet`` can split one file
    into many blocks — a single-row-group file caps read parallelism at 1.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    web_pages, expected = generate_corpus(n_per_family=n_per_family, seed=seed)
    paths = {
        "web_pages": os.path.join(out_dir, "web_pages.parquet"),
        "expected": os.path.join(out_dir, "expected_extractions.parquet"),
    }
    pq.write_table(web_pages, paths["web_pages"], row_group_size=1024)
    pq.write_table(expected, paths["expected"], row_group_size=1024)
    return paths


def write_replicated_corpus(
    out_dir: str,
    n_per_family: int = 600,
    replicas: int = 20,
    seed: int = 42,
) -> str:
    """A bench-scale corpus: ``replicas`` parquet files, each the base
    corpus with urls re-prefixed to stay unique. Many files → natural read
    parallelism and a realistic multi-shard input layout. Returns the
    directory of web_pages files."""
    import os

    pages_dir = os.path.join(out_dir, "web_pages")
    done_marker = os.path.join(out_dir, f".done-n{n_per_family}-r{replicas}")
    if os.path.exists(done_marker):
        return pages_dir
    os.makedirs(pages_dir, exist_ok=True)
    web_pages, _ = generate_corpus(n_per_family=n_per_family, seed=seed)
    urls = web_pages["url"].to_pylist()
    for r in range(replicas):
        t = web_pages.set_column(
            0,
            "url",
            pa.array(
                [u.replace("https://", f"https://r{r:03d}.") for u in urls],
                pa.string(),
            ),
        )
        pq.write_table(
            t, os.path.join(pages_dir, f"part-{r:04d}.parquet"),
            row_group_size=1024,
        )
    with open(done_marker, "w") as f:
        f.write("ok")
    return pages_dir

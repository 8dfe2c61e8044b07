"""Deterministic ~1k-piece BPE-style vocab fixture for the DC_TOKENIZER
seam (round-6, VERDICT r5 Next #6).

The ``.json`` greedy-vocab tokenizer (functions/tokenizer.py) is the
in-container stand-in for tiktoken/HF; this builder gives it a
REALISTIC vocabulary — whole common words, word prefixes (the shape BPE
merges converge to), productive affixes, and single-character
fallbacks — so the measured Arrow-stage cost (scripts/bench_tokenizer.py)
reflects real greedy-longest-match work, not a toy 3-piece vocab.
Deterministic: a pure function of the static word lists, no RNG, so the
checked-in fixture regenerates byte-identical.
"""

from __future__ import annotations

import json
import string

from datacurator_jl_spark.testing.synth import _DE, _EN_COMMON, _FR

_SUFFIXES = [
    "ing", "ed", "ly", "er", "est", "tion", "ness", "ment", "ous", "ful",
    "less", "able", "ive", "al", "ic", "ity", "ism", "ist", "ize", "en",
    "es", "s", "'s",
]
_PREFIXES = [
    "un", "re", "in", "dis", "pre", "post", "over", "under", "sub",
    "inter", "trans", "non", "anti", "de", "mis", "con", "com", "ex",
]

# top common-English words beyond the synth lists, so the vocab reaches
# a realistic ~1k pieces (static, no RNG)
_COMMON_EN = (
    "about above after again against almost alone along already also "
    "although always among amount ancient anger animal answer appear "
    "apple area argue around arrive article artist attack attempt "
    "attention aunt autumn avoid awake baby back ball bank base basket "
    "battle bear beauty become bed begin behind believe bell belong "
    "beside better between beyond bicycle bird birth black blood blue "
    "board boat body bone book border both bottle bottom box branch "
    "bread break breakfast breath bridge bright bring brother build "
    "burn business busy butter buy cake call camp capital captain car "
    "card care carry case catch cattle cause center century certain "
    "chance change character charge chief child choose church circle "
    "city class clean clear climb clock close cloth cloud coast coat "
    "cold collect college color come common company compare complete "
    "condition consider contain continue control cook cool copy corn "
    "corner correct cost cotton could count country course cover "
    "create cross crowd crop cry culture current cut dance danger "
    "dark date daughter dead deal dear death decide deep degree "
    "demand describe desert design desire destroy detail determine "
    "develop device dictionary difference different difficult dinner "
    "direct direction discover distance divide doctor does dollar "
    "double doubt down draw dream dress drink drive drop dry during "
    "duty each early earth east easy eat edge effect effort eight "
    "either electric element else employ empty end enemy energy "
    "engine enjoy enough enter equal escape even evening event ever "
    "every exact example except exercise exist expect experience "
    "explain express face fact fair fall family famous far farm fast "
    "father fear feed feel fellow felt fence field fight figure fill "
    "final find fine finger finish fire first fish fit five fix floor "
    "flow flower follow food foot force foreign forest forget form "
    "forward four free fresh friend from front fruit full future "
    "garden gate gather general gentle girl give glad glass goes gold "
    "good govern grain grand grass gray great green ground group grow "
    "guard guess guide half hand happen happy hard have head health "
    "hear heart heat heavy help here high hill history hold hole home "
    "hope horse hospital hour house human hundred hunger hunt hurry "
    "idea important include increase indeed industry inside instead "
    "interest iron island join judge jump just keep kill kind king "
    "kitchen knee knife know labor lady lake land language large last "
    "late laugh law lead learn leave left length letter level library "
    "life lift light like line list listen little live long look lose "
    "loud love machine main make manner many mark market master "
    "material matter mean measure meat meet member memory metal "
    "middle might mile milk million mind minute miss modern moment "
    "money month moon more morning most mother mountain mouth move "
    "much music must name nation nature near necessary neck need "
    "neighbor never news next night nine noise north nose note "
    "nothing notice number object observe ocean offer office often "
    "old once only open opinion order other ought outside over own "
    "page paint pair paper part party pass past pattern pay peace "
    "people perhaps period person picture piece place plain plan "
    "plant play please plenty point poor popular position possible "
    "pound power prepare present president press pretty price print "
    "probable problem produce promise proper protect prove provide "
    "public pull purpose push put quality question quick quiet quite "
    "race radio rain raise rather reach read ready real reason "
    "receive record red remember remove repeat reply report represent "
    "require rest result return rich ride right ring rise river road "
    "rock roll room round rule safe sail salt same sand save say "
    "scale school science sea season seat second section seem sell "
    "send sense sentence separate serious serve settle seven several "
    "shall shape share sharp ship shoe shop short should shoulder "
    "shout show side sign silver simple since sing single sister sit "
    "situation six size skill skin sky sleep slow small smile snow "
    "soft soil soldier some song soon sound south space speak special "
    "speed spend spread spring square stand star start state station "
    "stay steel step still stone stop store storm story straight "
    "strange stream street strength strike strong student study "
    "subject succeed such sudden suffer sugar summer supply support "
    "suppose sure surface surprise sweet swim system table tail take "
    "talk tall teach team tell temperature term test than that their "
    "them then there these they thick thin thing think third this "
    "those though thought thousand three through throw thus time tiny "
    "today together tomorrow tonight tool tooth touch toward town "
    "trade train travel tree trip trouble true trust turn twelve "
    "twenty type uncle understand unit until upon use usual valley "
    "value various very view village visit voice wait walk wall want "
    "warm wash watch water wave weak wear week weight welcome well "
    "west wheel when where whether which while white whole whose wide "
    "wife wild will wind window winter wise wish with within without "
    "woman wonder wood word work world would write wrong yard year "
    "yellow yesterday young your"
).split()

VOCAB_SIZE = 1024


def build_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Ordered, deduped piece list: single printable-ASCII chars (the
    OOV floor), affixes, whole words (plus capitalized forms), and
    2..6-char word prefixes, truncated to ``size`` deterministically."""
    pieces: dict[str, None] = {}

    def add(p: str) -> None:
        if p and p not in pieces:
            pieces[p] = None

    for ch in string.printable[:95]:  # letters, digits, punctuation, space
        add(ch)
    for a in _SUFFIXES + _PREFIXES:
        add(a)
    # frequency-shaped, like a real BPE vocab: the corpus-dominant words
    # (synth lists) first so they survive the size cut whole, then the
    # broader common-English tail, then merge-shaped prefixes
    core = sorted(set(_EN_COMMON) | set(_FR) | set(_DE))
    for w in core:
        add(w)
        add(w.capitalize())
    for w in sorted(set(_COMMON_EN) - set(core)):
        add(w)
    for w in core:  # BPE-merge-shaped subwords
        for j in range(2, min(6, len(w))):
            add(w[:j])
    return list(pieces)[:size]


def write_vocab_fixture(path: str, size: int = VOCAB_SIZE) -> str:
    with open(path, "w") as fh:
        json.dump({"vocab": build_vocab(size)}, fh, indent=0)
    return path

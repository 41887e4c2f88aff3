"""Embedded seed vocabularies for the non-latin language extension.

The reference, being LLM-backed, scored any language
(``src/processor.py:148-186``); the deterministic engine ships one frozen
char-ngram model per covered language (CCNet pattern — Wenzek et al.
2020) and identifies non-latin languages by script evidence (the signal a
char-ngram classifier effectively learns for single-language scripts).

These pools extend coverage to the four largest non-latin web scripts:
Cyrillic (ru), Arabic (ar), Japanese (kana+kanji), Korean (hangul).
Content is generic high-frequency function words / common characters from
public frequency lists — enough signal for trigram models over
deterministic pseudo-sentences; NOT a linguistic resource. Changing any
pool re-freezes the derived model tables and calibrations.

Kept separate from ``synth.WORDS`` on purpose: synth's pool feeds the
5-language driver test tables and the POOLED fallback perplexity model,
both frozen in goldens — extending those in place would silently re-freeze
every golden. New languages get their own models and never route to the
pooled model.
"""

from __future__ import annotations

RU_WORDS = (
    "и в не на я быть он с что а по это она этот к но они мы как из у "
    "который то за свой весь год от так о для ты же все тот мочь вы "
    "человек такой его сказать только или еще бы себя один как уже до "
    "время если сам когда другой вот говорить наш мой знать стать при "
    "чтобы дело жизнь кто первый очень два день ее новый рука даже во"
).split()

AR_WORDS = (
    "في من على أن إلى عن مع هذا هذه التي الذي كان لا ما أو ثم قد كل لم "
    "بعد غير حتى إذا كما لكن منذ بين يوم عند قال وهو بها له هو هي نحن "
    "أنا أنت عام مصر بلد عمل وقت حال مكان شيء ناس كبير صغير جديد"
).split()

# Hiragana + katakana cores and common kanji — char-level model material.
JA_KANA = list(
    "あいうえおかきくけこさしすせそたちつてとなにぬねのはひふへほまみむめも"
    "やゆよらりるれろわをんがぎぐげござじずぜぞだぢづでどばびぶべぼぱぴぷぺぽ"
    "アイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホマミムメモ"
    "ヤユヨラリルレロワヲンー"
)
JA_KANJI = list("日本人年月時分国語学校会社電車新聞今何私行見言思出入大小中上下")
JA_CHARS = JA_KANA + JA_KANJI

# Common hangul syllables — Korean IS space-segmented, so the model is
# char-level but sentences are built as 1-4 syllable "words".
KO_CHARS = list(
    "가나다라마바사아자차카타파하고노도로모보소오조초코토포호구누두루무부수"
    "우주추쿠투푸후그는들를이의에서와과한할했것었있없같만더도또좀잘못"
)

# Natural seed sentences for the char-level ja/ko perplexity models.
# A char-trigram model trained on UNIFORM-RANDOM character draws learns
# only vocabulary membership — in-domain and same-script-garbage text
# then tie at ~log2(vocab) bits/char and the fluency signal is dead. Real
# sentences give the model actual sequence structure: natural text reuses
# their trigrams (low ppl) while shuffled/random same-vocab strings hit
# unseen trigrams (high ppl). Hand-written simple prose, frozen as part
# of the model definition. (zh deliberately stays on random ZH_CHARS
# draws: the synthetic zh document universe — driver fixtures, goldens —
# is itself random-draw, and its model must stay consistent with it.)
JA_SENTENCES = [
    "日本語のテキストをここに書きます。",
    "今日は天気がとてもいいですね。",
    "私は毎朝電車で会社に行きます。",
    "この本はとても面白いと思います。",
    "学校で新しい言葉を勉強しました。",
    "友達と一緒に映画を見に行きました。",
    "明日の朝は早く起きなければなりません。",
    "日本の食べ物はおいしいですが、少し高いです。",
    "彼は毎日新聞を読んでいます。",
    "この町には大きな公園があります。",
    "私の家族は四人です。",
    "来週の土曜日に旅行に行く予定です。",
    "雨が降っているので、傘を持って行きます。",
    "仕事が終わったら、すぐに帰ります。",
    "何時に駅で会いましょうか。",
    "その問題はとても難しかったです。",
    "写真を撮るのが好きです。",
    "電話番号を教えてください。",
    "昨日の夜は遅くまで起きていました。",
    "新しいパソコンを買いたいと思っています。",
    "時間があれば、ぜひ遊びに来てください。",
    "この近くに銀行はありますか。",
    "彼女は英語と日本語が話せます。",
    "夏休みに海へ行きました。",
]
KO_SENTENCES = [
    "오늘은 날씨가 정말 좋습니다.",
    "저는 매일 아침 회사에 갑니다.",
    "이 책은 아주 재미있습니다.",
    "친구와 같이 영화를 봤습니다.",
    "한국 음식은 맛있지만 조금 맵습니다.",
    "내일 아침에 일찍 일어나야 합니다.",
    "그는 매일 신문을 읽습니다.",
    "이 동네에는 큰 공원이 있습니다.",
    "우리 가족은 네 명입니다.",
    "다음 주 토요일에 여행을 갈 예정입니다.",
    "비가 와서 우산을 가지고 갑니다.",
    "일이 끝나면 바로 집에 갑니다.",
    "몇 시에 역에서 만날까요.",
    "그 문제는 너무 어려웠습니다.",
    "사진을 찍는 것을 좋아합니다.",
    "전화번호를 알려 주세요.",
    "어제 밤에는 늦게까지 깨어 있었습니다.",
    "새 컴퓨터를 사고 싶습니다.",
    "시간이 있으면 꼭 놀러 오세요.",
    "이 근처에 은행이 있습니까.",
    "그녀는 영어와 한국어를 할 수 있습니다.",
    "여름 방학에 바다에 갔습니다.",
]

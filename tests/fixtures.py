"""Tiny offline document fixtures for every registered task.

The reference drives its harness tests against live HF datasets; this repo is
built offline-first, so each task gets a handful of synthetic docs in the raw
schema the task's ``_process_doc`` expects. Fixtures are deterministic —
golden request hashes (tests/test_tasks_golden.py) depend on that.
"""

from llm_lns_quantization_tpu import tasks as task_lib

_WIKI_PAGE = (
    " = Valkyria Chronicles = \n The game takes place in Europa , and follows "
    "a militia unit . It received positive reviews @-@ mostly . \n"
)

FIXTURE_DOCS = {
    "wikitext": {
        "train": [{"page": _WIKI_PAGE}],
        "validation": [{"page": _WIKI_PAGE}, {"page": " = History = \n Early work on logarithms . \n"}],
        "test": [{"page": _WIKI_PAGE * 2}],
    },
    "lambada_standard": {
        "validation": [
            {"text": "the boy opened the door and saw the dog"},
            {"text": "she poured the tea into a cup"},
        ],
        "test": [
            {"text": "he picked up the pen and started to write"},
            {"text": "the sun rose over the quiet mountain"},
        ],
    },
    "lambada_openai": {
        "test": [
            {"text": "the boy opened the door and saw the dog"},
            {"text": "my favourite season of the year is spring"},
        ],
    },
    "hellaswag": {
        "train": [
            {
                "activity_label": "Cooking",
                "ctx_a": "A man is in a kitchen.",
                "ctx_b": "he",
                "endings": ["cooks pasta.", "flies away.", "sings loudly.", "sleeps."],
                "label": "0",
            }
        ],
        "validation": [
            {
                "activity_label": "Running",
                "ctx_a": "A woman ties her shoes.",
                "ctx_b": "she",
                "endings": ["starts to run.", "eats a shoe.", "paints a wall.", "drives."],
                "label": "0",
            },
            {
                "activity_label": "Swimming",
                "ctx_a": "A boy stands at the pool edge.",
                "ctx_b": "he",
                "endings": ["reads a book.", "dives into the water.", "mows grass.", "naps."],
                "label": "1",
            },
        ],
    },
    "piqa": {
        "train": [
            {"goal": "open a jar", "sol1": "twist the lid", "sol2": "smash it", "label": 0}
        ],
        "validation": [
            {"goal": "dry wet shoes", "sol1": "stuff with newspaper", "sol2": "freeze them", "label": 0},
            {"goal": "light a candle", "sol1": "use a match", "sol2": "use an ice cube", "label": 0},
        ],
    },
    "arc_easy": {
        "train": [
            {
                "id": "t1",
                "question": "What do plants need for photosynthesis?",
                "choices": {"text": ["sunlight", "darkness", "sand", "plastic"], "label": ["A", "B", "C", "D"]},
                "answerKey": "A",
            }
        ],
        "validation": [
            {
                "id": "v1",
                "question": "Which is a liquid at room temperature?",
                "choices": {"text": ["iron", "water", "oxygen", "salt"], "label": ["A", "B", "C", "D"]},
                "answerKey": "B",
            }
        ],
        "test": [
            {
                "id": "x1",
                "question": "What gas do humans exhale?",
                "choices": {"text": ["carbon dioxide", "helium", "neon", "argon"], "label": ["A", "B", "C", "D"]},
                "answerKey": "1",
            }
        ],
    },
    "openbookqa": {
        "train": [
            {
                "id": "ob-t1",
                "question_stem": "The sun is the source of",
                "choices": {"text": ["energy", "ice", "night", "rock"], "label": ["A", "B", "C", "D"]},
                "answerKey": "A",
            }
        ],
        "validation": [
            {
                "id": "ob-v1",
                "question_stem": "Frogs hatch from",
                "choices": {"text": ["stones", "eggs", "leaves", "clouds"], "label": ["A", "B", "C", "D"]},
                "answerKey": "B",
            }
        ],
        "test": [
            {
                "id": "ob-x1",
                "question_stem": "Rain comes from",
                "choices": {"text": ["clouds", "fire", "sand", "metal"], "label": ["A", "B", "C", "D"]},
                "answerKey": "A",
            }
        ],
    },
    "winogrande": {
        "train": [
            {
                "sentence": "The trophy does not fit in the suitcase because _ is too big.",
                "option1": "the trophy",
                "option2": "the suitcase",
                "answer": "1",
            }
        ],
        "validation": [
            {
                "sentence": "Ann asked Mary what time the library closes, because _ had forgotten.",
                "option1": "Ann",
                "option2": "Mary",
                "answer": "1",
            },
            {
                "sentence": "The delivery truck zoomed by the school bus because _ was going so fast.",
                "option1": "the delivery truck",
                "option2": "the school bus",
                "answer": "1",
            },
        ],
    },
    "boolq": {
        "train": [
            {"passage": "Water boils at 100 degrees Celsius at sea level.", "question": "does water boil at 100C", "label": 1}
        ],
        "validation": [
            {"passage": "The moon orbits the earth roughly every 27 days.", "question": "does the moon orbit the earth", "label": 1},
            {"passage": "Penguins are flightless birds.", "question": "can penguins fly", "label": 0},
        ],
    },
    "sciq": {
        "train": [
            {
                "question": "What force pulls objects toward earth?",
                "distractor1": "magnetism",
                "distractor2": "friction",
                "distractor3": "inertia",
                "correct_answer": "gravity",
                "support": "Gravity is the force of attraction between masses.",
            }
        ],
        "validation": [
            {
                "question": "What is H2O commonly called?",
                "distractor1": "salt",
                "distractor2": "sugar",
                "distractor3": "air",
                "correct_answer": "water",
                "support": "H2O is the chemical formula for water.",
            }
        ],
        "test": [
            {
                "question": "What organ pumps blood?",
                "distractor1": "lung",
                "distractor2": "liver",
                "distractor3": "kidney",
                "correct_answer": "heart",
                "support": "",
            }
        ],
    },
}


def make_task(task_name: str):
    """Instantiate a registered task on its offline fixture docs."""
    cls = task_lib.get_task(task_name)
    return cls(custom_docs=FIXTURE_DOCS[task_name])


def fixture_task_dict(names=None):
    names = names or sorted(FIXTURE_DOCS)
    return {name: make_task(name) for name in names}

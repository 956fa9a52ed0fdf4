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
        "test": [{"page": _WIKI_PAGE * 2},
                 {"page": " = Logarithms = \n A logarithm maps products to sums , simplifying long computations . \n"}],
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
            },
            {
                "id": "x2",
                "question": "Which planet is closest to the sun?",
                "choices": {"text": ["Venus", "Mercury", "Mars", "Jupiter"], "label": ["A", "B", "C", "D"]},
                "answerKey": "B",
            },
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


# ---------------------------------------------------------------------------
# Fixture expansion batches: each entry is the raw HF schema the task's
# _process_doc expects, 2-3 docs per needed split. Golden hashes in
# tests/testdata/ are built from these, so keep them frozen.
# ---------------------------------------------------------------------------

FIXTURE_DOCS.update({
    "arc_challenge": {
        "train": [
            {"id": "t1", "question": "Which gas do plants absorb?",
             "choices": {"text": ["Oxygen", "Carbon dioxide", "Helium", "Neon"],
                         "label": ["A", "B", "C", "D"]},
             "answerKey": "B"},
        ],
        "test": [
            {"id": "q1", "question": "What force pulls objects to Earth?",
             "choices": {"text": ["magnetism", "gravity", "friction", "lift"],
                         "label": ["A", "B", "C", "D"]},
             "answerKey": "B"},
            {"id": "q2", "question": "Which unit measures mass?",
             "choices": {"text": ["meter", "second", "kilogram", "3"],
                         "label": ["A", "B", "C", "1"]},
             "answerKey": "C"},
        ],
    },
    "copa": {
        "train": [
            {"premise": "The man felt tired.", "choice1": "He slept.",
             "choice2": "He ran a race.", "question": "effect", "label": 0},
        ],
        "validation": [
            {"premise": "The plant wilted.", "choice1": "It was watered daily.",
             "choice2": "It got no water.", "question": "cause", "label": 1},
            {"premise": "The crowd cheered.", "choice1": "The team scored.",
             "choice2": "The lights failed.", "question": "cause", "label": 0},
        ],
    },
    "rte": {
        "train": [
            {"sentence1": "A cat sat on the mat.",
             "sentence2": "An animal is on the mat.", "label": 0},
        ],
        "validation": [
            {"sentence1": "The sky is clear today.",
             "sentence2": "It is raining heavily.", "label": 1},
            {"sentence1": "John bought three apples.",
             "sentence2": "John bought fruit.", "label": 0},
        ],
    },
    "cb": {
        "train": [
            {"premise": "She said she would come.",
             "hypothesis": "She will come", "label": 0},
        ],
        "validation": [
            {"premise": "He denied taking the money.",
             "hypothesis": "He took the money", "label": 1},
            {"premise": "Maybe the train is late.",
             "hypothesis": "The train is late", "label": 2},
        ],
    },
    "wic": {
        "train": [
            {"sentence1": "The bank was closed.",
             "sentence2": "They sat on the river bank.",
             "start1": 4, "end1": 8, "start2": 22, "end2": 26, "label": 0},
        ],
        "validation": [
            {"sentence1": "She will chair the meeting.",
             "sentence2": "He bought a new chair.",
             "start1": 9, "end1": 14, "start2": 16, "end2": 21, "label": 0},
            {"sentence1": "Light travels fast.",
             "sentence2": "The light was on.",
             "start1": 0, "end1": 5, "start2": 4, "end2": 9, "label": 1},
        ],
    },
    "wsc": {
        "train": [
            {"text": "The dog chased the cat because it was fast.",
             "span1_text": "the cat", "span2_text": "it",
             "span1_index": 3, "span2_index": 6, "label": 1},
        ],
        "validation": [
            {"text": "Anna gave Mary a book since she liked reading.",
             "span1_text": "Mary", "span2_text": "she",
             "span1_index": 2, "span2_index": 6, "label": 1},
            {"text": "The trophy did not fit in the case because it was big.",
             "span1_text": "the case", "span2_text": "it",
             "span1_index": 6, "span2_index": 9, "label": 0},
        ],
    },
    "multirc": {
        "train": [
            {"paragraph": "Tom went to the market. He bought bread and milk.",
             "question": "What did Tom buy?", "answer": "bread and milk",
             "label": 1, "idx": {"paragraph": 0, "question": 0, "answer": 0}},
        ],
        "validation": [
            {"paragraph": "The river flows north into the great lake.",
             "question": "Where does the river flow?", "answer": "into the lake",
             "label": 1, "idx": {"paragraph": 1, "question": 0, "answer": 0}},
            {"paragraph": "The river flows north into the great lake.",
             "question": "Where does the river flow?", "answer": "into the sea",
             "label": 0, "idx": {"paragraph": 1, "question": 0, "answer": 1}},
            {"paragraph": "Birds migrate south for the winter.",
             "question": "Why do birds migrate?", "answer": "to escape cold",
             "label": 1, "idx": {"paragraph": 2, "question": 1, "answer": 0}},
        ],
    },
    "record": {
        "train": [
            {"passage": "The storm hit the coast on Monday.\n@highlight\nStorm damage reported",
             "query": "Officials said @placeholder caused flooding.",
             "entities": ["the storm", "the coast"],
             "answers": ["the storm"]},
        ],
        "validation": [
            {"passage": "Scientists discovered a new species in the forest.\n@highlight\nNew species found",
             "query": "The @placeholder team published their findings.",
             "entities": ["Scientists", "forest"],
             "answers": ["Scientists"]},
            {"passage": "The council approved the new bridge on Tuesday.\n@highlight\nBridge approved",
             "query": "Construction of @placeholder begins next spring.",
             "entities": ["the new bridge", "the council"],
             "answers": ["the new bridge"]},
        ],
    },
    "cola": {
        "train": [{"sentence": "The boy runs quickly.", "label": 1}],
        "validation": [
            {"sentence": "The cat sat on the mat.", "label": 1},
            {"sentence": "Runs boy the quickly home.", "label": 0},
        ],
    },
    "sst": {
        "train": [{"sentence": "a heartfelt and moving film", "label": 1}],
        "validation": [
            {"sentence": "an utter waste of time", "label": 0},
            {"sentence": "bright , funny and entertaining", "label": 1},
        ],
    },
    "mrpc": {
        "train": [
            {"sentence1": "The company reported strong earnings.",
             "sentence2": "Strong earnings were reported by the company.",
             "label": 1},
        ],
        "validation": [
            {"sentence1": "The meeting was moved to Friday.",
             "sentence2": "The cafeteria serves lunch at noon.", "label": 0},
            {"sentence1": "Shares rose 5 percent on Monday.",
             "sentence2": "The stock gained five percent Monday.", "label": 1},
        ],
    },
    "qqp": {
        "train": [
            {"question1": "How do I learn piano?",
             "question2": "What is the best way to learn piano?", "label": 1},
        ],
        "validation": [
            {"question1": "What causes rain?",
             "question2": "Why does it rain?", "label": 1},
            {"question1": "How tall is Everest?",
             "question2": "What is the capital of Peru?", "label": 0},
        ],
    },
    "qnli": {
        "train": [
            {"question": "When was the bridge built?",
             "sentence": "The bridge was completed in 1932.", "label": 0},
        ],
        "validation": [
            {"question": "Who wrote the novel?",
             "sentence": "The weather was cold that year.", "label": 1},
            {"question": "Where is the museum?",
             "sentence": "The museum is in the old town square.", "label": 0},
        ],
    },
    "mnli": {
        "train": [
            {"premise": "A man is playing a guitar on stage.",
             "hypothesis": "A musician performs", "label": 0},
        ],
        "validation_matched": [
            {"premise": "Two dogs run through the field.",
             "hypothesis": "The animals are outside.", "label": 0},
            {"premise": "She ordered a salad for lunch.",
             "hypothesis": "She ate a burger", "label": 2},
        ],
    },
    "mnli_mismatched": {
        "train": [
            {"premise": "A man is playing a guitar on stage.",
             "hypothesis": "A musician performs", "label": 0},
        ],
        "validation_mismatched": [
            {"premise": "The committee approved the budget.",
             "hypothesis": "The budget was rejected", "label": 2},
            {"premise": "Children laughed at the circus.",
             "hypothesis": "Kids were amused.", "label": 0},
        ],
    },
    "wnli": {
        "train": [
            {"sentence1": "The cup fell off the table and it broke.",
             "sentence2": "The cup broke.", "label": 1},
        ],
        "validation": [
            {"sentence1": "Jane thanked Susan for the help she gave.",
             "sentence2": "Susan gave the help.", "label": 1},
            {"sentence1": "The ball hit the window and it shattered.",
             "sentence2": "The ball shattered.", "label": 0},
        ],
    },
})

FIXTURE_DOCS.update({
    "gsm8k": {
        "train": [
            {"question": "Tom has 3 apples and buys 2 more. How many?",
             "answer": "Tom has 3 + 2 = <<3+2=5>>5 apples.\n#### 5"},
        ],
        "test": [
            {"question": "A farm has 4 cows and 3 sheep. How many animals?",
             "answer": "4 + 3 = <<4+3=7>>7 animals.\n#### 7"},
            {"question": "Sara reads 10 pages a day for 3 days. How many pages?",
             "answer": "10 * 3 = <<10*3=30>>30 pages.\n#### 30"},
        ],
    },
    "triviaqa": {
        "train": [
            {"question": "What is the capital of France?",
             "answer": {"value": "Paris", "aliases": ["Paris", "paris"]}},
        ],
        "validation": [
            {"question": "Which planet is known as the red planet?",
             "answer": {"value": "Mars", "aliases": ["Mars", "mars"]}},
            {"question": "Who wrote Hamlet?",
             "answer": {"value": "William Shakespeare",
                        "aliases": ["Shakespeare", "William Shakespeare"]}},
        ],
    },
    "truthfulqa_mc": {
        "validation": [
            {"question": "What happens if you crack your knuckles?",
             "mc1_targets": {"choices": ["Nothing in particular happens.",
                                         "You get arthritis."],
                             "labels": [1, 0]},
             "mc2_targets": {"choices": ["Nothing in particular happens.",
                                         "It is harmless.",
                                         "You get arthritis."],
                             "labels": [1, 1, 0]}},
            {"question": "Where does the sun go at night?",
             "mc1_targets": {"choices": ["It is on the other side of Earth.",
                                         "It sleeps."],
                             "labels": [1, 0]},
             "mc2_targets": {"choices": ["Earth rotates away from it.",
                                         "It sleeps."],
                             "labels": [1, 0]}},
        ],
    },
    "drop": {
        "train": [
            {"query_id": "d0",
             "passage": "The team scored 21 points in the first half and 14 in the second.",
             "question": "How many points did the team score in total?",
             "answer": {"number": "35",
                        "date": {"day": "", "month": "", "year": ""},
                        "spans": []},
             "validated_answers": {"number": [], "date": [], "spans": []}},
        ],
        "validation": [
            {"query_id": "d1",
             "passage": "The bridge was built in 1920 and rebuilt in 1950.",
             "question": "How many years between construction and rebuilding?",
             "answer": {"number": "30",
                        "date": {"day": "", "month": "", "year": ""},
                        "spans": []},
             "validated_answers": {"number": [], "date": [], "spans": []}},
            {"query_id": "d2",
             "passage": "Anna ran 5 km on Monday and 3 km on Tuesday.",
             "question": "How many km did Anna run?",
             "answer": {"number": "8",
                        "date": {"day": "", "month": "", "year": ""},
                        "spans": []},
             "validated_answers": {"number": [""],
                                   "date": [{"day": "", "month": "", "year": ""}],
                                   "spans": [["8 km"]]}},
        ],
    },
    # raw HF race schema: one row per question; tasks collate per article
    "race": {
        "train": [
            {"article": "The library opens at nine in the morning and closes at five.",
             "question": "When does the library open?",
             "options": ["At nine", "At five", "At noon", "At eight"],
             "answer": "A"},
        ],
        "test": [
            {"article": "Ben planted a small garden. He watered it every day and soon green shoots appeared.",
             "question": "What did Ben plant?",
             "options": ["a tree", "a garden", "a flag", "a fence"],
             "answer": "B"},
            {"article": "Ben planted a small garden. He watered it every day and soon green shoots appeared.",
             "question": "Question: How often did Ben water it?",
             "options": ["every day", "weekly", "never", "monthly"],
             "answer": "A"},
        ],
    },
    "logiqa": {
        "train": [
            {"context": "All managers attended the meeting. Lee is a manager.",
             "question": "Which conclusion follows?",
             "options": ["Lee attended the meeting.", "Lee was absent.",
                         "Lee is not a manager.", "The meeting was cancelled."],
             "label": "a"},
        ],
        "test": [
            {"context": "If it rains, the match is postponed. The match was not postponed.",
             "question": "What can be concluded?",
             "options": ["It rained.", "It did not rain.",
                         "The match was cancelled.", "Nothing follows."],
             "label": "b"},
        ],
    },
    "mathqa": {
        "train": [
            {"Problem": "what is 2 + 3 ?",
             "options": "a ) 4 , b ) 5 , c ) 6 , d ) 7 , e ) 8",
             "correct": "b"},
        ],
        "test": [
            {"Problem": "a train travels 60 km in 2 hours . what is its speed ?",
             "options": "a ) 20 kmph , b ) 25 kmph , c ) 30 kmph , d ) 35 kmph , e ) 40 kmph",
             "correct": "c"},
        ],
    },
    "pubmedqa": {
        "train": [
            {"QUESTION": "Does smoking increase lung cancer risk?",
             "CONTEXTS": ["Large studies show higher incidence among smokers."],
             "final_decision": "yes"},
        ],
        "test": [
            {"QUESTION": "Does exercise improve cardiovascular health?",
             "CONTEXTS": ["A cohort study followed 500 adults over 5 years.",
                          "Regular exercise correlated with fewer cardiac events."],
             "final_decision": "yes"},
            {"QUESTION": "Is compound X effective against the condition?",
             "CONTEXTS": ["A small trial found no significant difference."],
             "final_decision": "no"},
        ],
    },
    "headqa_en": {
        "train": [
            {"qid": "h0", "qtext": "Which organ filters blood?",
             "answers": [{"atext": "liver"}, {"atext": "kidney"},
                         {"atext": "lung"}, {"atext": "spleen"}],
             "ra": "2"},
        ],
        "test": [
            {"qid": "h1", "qtext": "Which vitamin is produced in skin under sunlight?",
             "answers": [{"atext": "vitamin A"}, {"atext": "vitamin B"},
                         {"atext": "vitamin C"}, {"atext": "vitamin D"}],
             "ra": "4"},
        ],
    },
    "webqs": {
        "train": [
            {"question": "what is the capital of spain?",
             "answers": ["Madrid"]},
        ],
        "test": [
            {"question": "who invented the telephone?",
             "answers": ["Alexander Graham Bell", "Bell"]},
        ],
    },
    "squad2": {
        "train": [
            {"id": "s0", "title": "Rivers",
             "context": "The Nile flows through Egypt into the Mediterranean.",
             "question": "Where does the Nile flow?",
             "answers": {"text": ["through Egypt"], "answer_start": [14]}},
        ],
        "validation": [
            {"id": "s1", "title": "Mountains",
             "context": "Everest is the tallest mountain on Earth.",
             "question": "What is the tallest mountain?",
             "answers": {"text": ["Everest"], "answer_start": [0]}},
            {"id": "s2", "title": "Mountains",
             "context": "Everest is the tallest mountain on Earth.",
             "question": "Who first climbed K3?",
             "answers": {"text": [], "answer_start": []}},
        ],
    },
    "anli_r1": {
        "train_r1": [
            {"premise": "A chef prepares pasta in the kitchen.",
             "hypothesis": "Food is being made.", "label": 0},
        ],
        "dev_r1": [
            {"premise": "The store closes at 8 pm on weekdays.",
             "hypothesis": "The store is open all night.", "label": 2},
        ],
        "test_r1": [
            {"premise": "A band played music at the festival.",
             "hypothesis": "There was live music.", "label": 0},
            {"premise": "The train left the station at noon.",
             "hypothesis": "The train never departed.", "label": 2},
        ],
    },
    "prost": {
        "test": [
            {"context": "A ball is dropped onto concrete, grass, sand, and mud.",
             "ex_question": "On which surface will it bounce the highest?",
             "A": "concrete", "B": "grass", "C": "sand", "D": "mud",
             "label": 0},
        ],
    },
    "swag": {
        "train": [
            {"startphrase": "The chef turns on the stove and",
             "ending0": "heats the pan.", "ending1": "paints the wall.",
             "ending2": "reads a novel.", "ending3": "drives away.",
             "label": "0"},
        ],
        "validation": [
            {"startphrase": "A runner crouches at the starting line and",
             "ending0": "falls asleep.", "ending1": "sprints forward.",
             "ending2": "builds a house.", "ending3": "eats dinner.",
             "label": "1"},
        ],
    },
})

FIXTURE_DOCS.update({
    "toxigen": {
        "train": [
            {"text": "this is a neutral statement about weather",
             "toxicity_ai": 1.0, "toxicity_human": 1.0},
        ],
        "test": [
            {"text": "statement one for the classifier",
             "toxicity_ai": 1.2, "toxicity_human": 1.4},
            {"text": "statement two with a different score",
             "toxicity_ai": 3.1, "toxicity_human": 3.3},
        ],
    },
    "crows_pairs_english": {
        "test": [
            {"sent_more": "The engineer fixed the problem quickly.",
             "sent_less": "The engineer fixed the problem slowly.",
             "bias_type": "profession"},
            {"sent_more": "The neighbor watered the garden.",
             "sent_less": "The neighbor flooded the garden.",
             "bias_type": "age"},
        ],
    },
    "ethics_cm": {
        "train": [{"input": "I returned the wallet I found.", "label": 0}],
        "test": [
            {"input": "I took credit for my colleague's work.", "label": 1},
            {"input": "I helped an elderly person cross the street.", "label": 0},
        ],
    },
    "mutual": {
        "train": [
            {"article": "m : the meeting starts at ten . f : i will be there early .",
             "options": ["f : i never attend meetings .",
                         "f : see you at the meeting .",
                         "f : the store is closed .",
                         "f : it rained yesterday ."],
             "answers": "B"},
        ],
        "validation": [
            {"article": "f : did you finish the report ? m : yes , i sent it last night .",
             "options": ["f : great , i will read it today .",
                         "f : the train was late .",
                         "f : my phone is broken .",
                         "f : winter is cold ."],
             "answers": "A"},
        ],
    },
    "mc_taco": {
        "validation": [
            {"sentence": "He left the office at 6 pm.",
             "question": "How long did he stay at the office?",
             "answer": "8 hours", "label": 1},
            {"sentence": "She napped after lunch.",
             "question": "How long was the nap?",
             "answer": "30 minutes", "label": 1},
        ],
        "test": [
            {"sentence": "The bakery opens every morning.",
             "question": "How long does it stay open?",
             "answer": "3 centuries", "label": 0},
            {"sentence": "The bakery opens every morning.",
             "question": "How long does it stay open?",
             "answer": "8 hours", "label": 1},
            {"sentence": "The bakery opens every morning.",
             "question": "How long does it stay open?",
             "answer": "9 hours", "label": 1},
            {"sentence": "The bakery opens every morning.",
             "question": "How long does it stay open?",
             "answer": "one blink", "label": 0},
            {"sentence": "The bakery opens every morning.",
             "question": "How long does it stay open?",
             "answer": "all day", "label": 1},
            {"sentence": "The bakery opens every morning.",
             "question": "How long does it stay open?",
             "answer": "two seconds", "label": 0},
        ],
    },
    "qa4mre_2013": {
        "train": [
            {"document_str": "The study explored how sleep affects memory consolidation in adults.",
             "question_str": "What did the study explore?",
             "answer_options": {"answer_str": ["sleep and memory", "diet plans",
                                               "exercise routines", "eye color",
                                               "house prices"]},
             "correct_answer_id": "1"},
            {"document_str": "Researchers measured reaction times under bright and dim light.",
             "question_str": "What was measured?",
             "answer_options": {"answer_str": ["reaction times", "blood sugar",
                                               "air pressure", "rainfall",
                                               "tree height"]},
             "correct_answer_id": "1"},
        ],
    },
    "hendrycksTest-abstract_algebra": {
        "dev": [
            {"question": "What is the inverse of 3 in Z_7 under addition?",
             "choices": ["3", "4", "0", "7"], "answer": 1},
            {"question": "Is Z_5 a field?",
             "choices": ["yes", "no", "only sometimes", "undefined"], "answer": 0},
        ],
        "validation": [
            {"question": "What is the order of the group Z_4?",
             "choices": ["2", "3", "4", "8"], "answer": 2},
        ],
        "test": [
            {"question": "How many elements does the symmetric group S_3 have?",
             "choices": ["3", "6", "9", "12"], "answer": 1},
            {"question": "What is the identity element of (Z, +)?",
             "choices": ["1", "-1", "0", "2"], "answer": 2},
        ],
    },
    "math_algebra": {
        "train": [
            {"problem": "Solve for x: x + 2 = 5.",
             "solution": "Subtracting, $x = \\boxed{3}$."},
        ],
        "test": [
            {"problem": "What is $2^3$?",
             "solution": "We compute $2^3 = \\boxed{8}$."},
        ],
    },
    "arithmetic_2da": {
        "validation": [
            {"context": "Question: What is 15 plus 24?\nAnswer:", "completion": " 39"},
            {"context": "Question: What is 33 plus 11?\nAnswer:", "completion": " 44"},
        ],
    },
    "anagrams1": {
        "validation": [
            {"context": "Please unscramble the letters into a word: pplea =", "completion": " apple"},
            {"context": "Please unscramble the letters into a word: rwod =", "completion": " word"},
        ],
    },
    "blimp_anaphor_gender_agreement": {
        "train": [
            {"sentence_good": "Katherine can't help herself.",
             "sentence_bad": "Katherine can't help himself."},
            {"sentence_good": "Mark praised himself.",
             "sentence_bad": "Mark praised herself."},
        ],
    },
    "pile_arxiv": {
        "validation": [{"text": "We study the spectral properties of random matrices."}],
        "test": [{"text": "In this paper we prove a bound on mixing times of Markov chains."},
                 {"text": "We derive a sharper constant for the spectral gap estimate."}],
    },
    "wmt16-en-de": {
        "test": [
            {"src": "The weather is nice today.", "ref": "Das Wetter ist heute schoen."},
            {"src": "I like reading books.", "ref": "Ich lese gerne Buecher."},
        ],
    },
    "xcopa_et": {
        "validation": [
            {"premise": "Mees avas akna.", "choice1": "Tuba laks jahedaks.",
             "choice2": "Tuba laks pimedaks.", "question": "effect", "label": 0},
            {"premise": "Koer haukus valjusti.", "choice1": "Keegi koputas uksele.",
             "choice2": "Paike paistis.", "question": "cause", "label": 0},
        ],
        "test": [
            {"premise": "Laps hakkas nutma.", "choice1": "Ta sai kingituse.",
             "choice2": "Ta kukkus maha.", "question": "cause", "label": 1},
        ],
    },
    "xnli_en": {
        "train": [
            {"premise": "A man inspects a uniform.", "hypothesis": "The man is sleeping", "label": 2},
        ],
        "validation": [
            {"premise": "Two women embrace while holding packages.",
             "hypothesis": "Two women hold packages.", "label": 0},
            {"premise": "The children smile and wave at the camera.",
             "hypothesis": "The children are frowning.", "label": 2},
        ],
        "test": [
            {"premise": "An older man drinks his juice.",
             "hypothesis": "A man is drinking juice.", "label": 0},
        ],
    },
    "pawsx_en": {
        "train": [
            {"sentence1": "The film was released in 1999 in Germany.",
             "sentence2": "The film came out in Germany in 1999.", "label": 1},
        ],
        "validation": [
            {"sentence1": "He moved to Paris to study painting.",
             "sentence2": "He moved to Rome to study sculpture.", "label": 0},
        ],
        "test": [
            {"sentence1": "The river runs through three countries.",
             "sentence2": "Three countries are crossed by the river.", "label": 1},
        ],
    },
    "xwinograd_en": {
        "test": [
            {"sentence": "The trophy doesn't fit in the suitcase because _ is too large.",
             "option1": "the trophy", "option2": "the suitcase", "answer": "1"},
            {"sentence": "The city councilmen refused the demonstrators a permit because _ feared violence.",
             "option1": "the councilmen", "option2": "the demonstrators", "answer": "1"},
        ],
    },
    "cmmlu-agronomy": {
        "dev": [
            {"Question": "Which gas do plants need for photosynthesis?",
             "A": "oxygen", "B": "carbon dioxide", "C": "argon", "D": "helium",
             "Answer": "B"},
        ],
        "test": [
            {"Question": "Which nutrient do legumes fix from the air?",
             "A": "nitrogen", "B": "carbon", "C": "iron", "D": "calcium",
             "Answer": "A"},
            {"Question": "Which season is wheat typically sown in temperate zones?",
             "A": "summer", "B": "autumn", "C": "never", "D": "daily",
             "Answer": "B"},
        ],
    },
})


# ---------------------------------------------------------------------------
# Programmatic fixture generation for homogeneous task families. Content is
# deterministic (derived from the task name — never Python's salted hash())
# so golden request hashes stay stable across processes.
# ---------------------------------------------------------------------------

import zlib as _zlib


def _sig(name):
    return _zlib.crc32(name.encode()) % 1000


def _mc_proc(name, i, n_choices=4, answer_prompt="Answer:"):
    """Processed multiple-choice doc for 'query-passthrough' exam tasks."""
    keys = ["A", "B", "C", "D", "E"][:n_choices]
    opts = "".join(
        f"{k}. option {_sig(name)}-{i}-{j}\n" for j, k in enumerate(keys)
    )
    return {
        "query": f"Sample {name} question {_sig(name)}-{i}?\n{opts}{answer_prompt}",
        "choices": keys,
        "gold": (i + _sig(name)) % n_choices,
    }


def _register_family(names, build):
    for name in names:
        if name not in FIXTURE_DOCS:
            FIXTURE_DOCS[name] = build(name)


def _family(prefix):
    return [n for n in task_lib.TASK_REGISTRY if n.startswith(prefix)]


# blimp: one "train" split of good/bad sentence pairs
_register_family(_family("blimp_"), lambda name: {
    "train": [
        {"sentence_good": f"The researcher近 verified example {_sig(name)}-{k} carefully.".replace("近", ""),
         "sentence_bad": f"The researcher verify example {_sig(name)}-{k} carefully."}
        for k in range(2)
    ],
})

# pile subsets: perplexity over raw text (2 scoring docs so analytic
# stderr over per-doc metrics is well-defined)
_register_family(_family("pile_"), lambda name: {
    "validation": [{"text": f"Validation document for {name} with id {_sig(name)}."}],
    "test": [{"text": f"Test document for {name} describing topic {_sig(name)} in detail."},
             {"text": f"Second test document for {name} with token id {_sig(name)}."}],
})

# MMLU: dev exemplars + validation + test (raw HF schema:
# question / choices / int answer — _process_doc builds the query)
def _mmlu_raw(name, i):
    return {
        "question": f"Sample {name} question {_sig(name)}-{i}?",
        "choices": [f"option {_sig(name)}-{i}-{j}" for j in range(4)],
        "answer": (i + _sig(name)) % 4,
    }


_register_family(_family("hendrycksTest-"), lambda name: {
    "dev": [_mmlu_raw(name, 10), _mmlu_raw(name, 11)],
    "validation": [_mmlu_raw(name, 20)],
    "test": [_mmlu_raw(name, 0), _mmlu_raw(name, 1)],
})


# CMMLU / C-Eval: raw exam-CSV schema (Question/A-D/Answer letter)
def _exam_raw(name, i, qkey="Question", akey="Answer"):
    return {
        qkey: f"Sample {name} question {_sig(name)}-{i}?",
        "A": f"option {_sig(name)}-{i}-0", "B": f"option {_sig(name)}-{i}-1",
        "C": f"option {_sig(name)}-{i}-2", "D": f"option {_sig(name)}-{i}-3",
        akey: "ABCD"[(i + _sig(name)) % 4],
    }


_register_family(_family("cmmlu-"), lambda name: {
    "dev": [_exam_raw(name, 10)],
    "test": [_exam_raw(name, 0), _exam_raw(name, 1)],
})

_register_family(_family("Ceval-valid-"), lambda name: {
    "dev": [_exam_raw(name, 10, qkey="question", akey="answer"),
            _exam_raw(name, 11, qkey="question", akey="answer")],
    "val": [_exam_raw(name, 0, qkey="question", akey="answer"),
            _exam_raw(name, 1, qkey="question", akey="answer")],
})

# csatqa / haerae: Korean MC suites (raw schemas: csatqa keeps
# context/question/option#N/1-based gold; haerae query/oN/1-based gold)
_register_family(_family("csatqa_"), lambda name: {
    "test": [
        {"context": f"지문 {_sig(name)}-{i}.",
         "question": f"질문 {_sig(name)}-{i}?",
         **{f"option#{j + 1}": f"보기 {_sig(name)}-{i}-{j}" for j in range(5)},
         "gold": (i + _sig(name)) % 5 + 1}
        for i in range(2)
    ],
})
_register_family(_family("haerae_"), lambda name: {
    "test": [
        {"query": f"질문 {_sig(name)}-{i}?",
         **{f"o{j + 1}": f"보기 {_sig(name)}-{i}-{j}" for j in range(4)},
         "o5": None,
         "gold": str((i + _sig(name)) % 4 + 1)}
        for i in range(2)
    ],
})

# XCOPA (premise final-period is stripped by doc_to_text)
_register_family(_family("xcopa_"), lambda name: {
    "validation": [
        {"premise": f"Premise {_sig(name)} alpha.", "choice1": f"choice one {_sig(name)}.",
         "choice2": f"choice two {_sig(name)}.", "question": "cause", "label": 0},
        {"premise": f"Premise {_sig(name)} beta.", "choice1": f"first option {_sig(name)}.",
         "choice2": f"second option {_sig(name)}.", "question": "effect", "label": 1},
    ],
    "test": [
        {"premise": f"Premise {_sig(name)} gamma.", "choice1": f"outcome a {_sig(name)}.",
         "choice2": f"outcome b {_sig(name)}.", "question": "effect", "label": 0},
    ],
})

# XNLI / PAWS-X
_register_family(_family("xnli_"), lambda name: {
    "train": [{"premise": f"Train premise {_sig(name)}.",
               "hypothesis": f"Train hypothesis {_sig(name)}", "label": 0}],
    "validation": [
        {"premise": f"Val premise {_sig(name)} one.",
         "hypothesis": f"Val hypothesis {_sig(name)} one", "label": 0},
        {"premise": f"Val premise {_sig(name)} two.",
         "hypothesis": f"Val hypothesis {_sig(name)} two", "label": 2},
    ],
    "test": [{"premise": f"Test premise {_sig(name)}.",
              "hypothesis": f"Test hypothesis {_sig(name)}", "label": 1}],
})
_register_family(_family("pawsx_"), lambda name: {
    "train": [{"sentence1": f"Train sentence {_sig(name)} a.",
               "sentence2": f"Train sentence {_sig(name)} b.", "label": 1}],
    "validation": [
        {"sentence1": f"Val sentence {_sig(name)} a.",
         "sentence2": f"Val sentence {_sig(name)} b.", "label": 0},
        {"sentence1": f"Val sentence {_sig(name)} c.",
         "sentence2": f"Val sentence {_sig(name)} d.", "label": 1},
    ],
    "test": [{"sentence1": f"Test sentence {_sig(name)} a.",
              "sentence2": f"Test sentence {_sig(name)} b.", "label": 1}],
})

# XWinograd
_register_family(_family("xwinograd_"), lambda name: {
    "test": [
        {"sentence": f"The item {_sig(name)} did not fit the box because _ was too large.",
         "option1": "the item", "option2": "the box", "answer": "1"},
        {"sentence": f"The robot {_sig(name)} thanked the maker because _ was grateful.",
         "option1": "the robot", "option2": "the maker", "answer": "1"},
    ],
})

# XStoryCloze / StoryCloze
def _story_docs(name):
    return [
        {"input_sentence_1": f"Ann started project {_sig(name)}.",
         "input_sentence_2": "She worked on it daily.",
         "input_sentence_3": "Progress was steady.",
         "input_sentence_4": "Finally it was ready.",
         "sentence_quiz1": "She shipped it proudly.",
         "sentence_quiz2": "She burned it down.",
         "answer_right_ending": 1},
        {"input_sentence_1": f"Ben found a coin {_sig(name)}.",
         "input_sentence_2": "It looked very old.",
         "input_sentence_3": "He took it to a museum.",
         "input_sentence_4": "An expert examined it.",
         "sentence_quiz1": "It was worthless plastic.",
         "sentence_quiz2": "It was a rare antique.",
         "answer_right_ending": 2},
    ]


_register_family(_family("xstory_cloze_"), lambda name: {
    "train": _story_docs(name)[:1],
    "eval": _story_docs(name),
})
_register_family(_family("storycloze_"), lambda name: {
    "validation": _story_docs(name),
    "test": _story_docs(name)[:1],
})

# MGSM: train docs carry the language-specific CoT answer prefix
def _mgsm_docs(name):
    cls = task_lib.get_task(name)
    ans = cls.ANSWER
    return {
        "train": [{"question": f"Q {_sig(name)}: 2 + 3 = ?",
                   "answer": f"{ans} 2 + 3 = 5. 5", "answer_number": 5}],
        "test": [{"question": f"Q {_sig(name)}: 4 + 4 = ?",
                  "answer": None, "answer_number": 8}],
    }


_register_family(_family("mgsm_"), _mgsm_docs)

# arithmetic / unscramble: context-completion over a validation split
_register_family(
    _family("arithmetic_")
    + ["anagrams2", "cycle_letters", "random_insertion", "reversed_words"],
    lambda name: {
        "validation": [
            {"context": f"Task {name} example one {_sig(name)} =",
             "completion": f" result{_sig(name)}"},
            {"context": f"Task {name} example two {_sig(name)} =",
             "completion": f" value{_sig(name)}"},
        ],
    },
)

# LAMBADA variants (cloze + multilingual share the {text} schema)
_register_family(["lambada_standard_cloze"], lambda name: {
    "validation": [
        {"text": f"the fixture {_sig(name)} sentence continues with word"},
        {"text": f"one more fixture {_sig(name)} line finishes with term"},
    ],
    "test": [{"text": f"another fixture {_sig(name)} sentence ends with token"}],
})
_register_family(
    ["lambada_openai_cloze"] + _family("lambada_openai_mt_"),
    lambda name: {
        "test": [
            {"text": f"multilingual fixture {_sig(name)} text ends here"},
            {"text": f"second multilingual fixture {_sig(name)} closes with phrase"},
        ],
    },
)

# MATH subjects (boxed answers)
_register_family(
    [n for n in _family("math_") if n != "math_asdiv"],
    lambda name: {
        "train": [{"problem": f"Compute {_sig(name)} + 1.",
                   "solution": f"Adding gives $\\boxed{{{_sig(name) + 1}}}$."}],
        "test": [{"problem": f"Compute {_sig(name)} + 2.",
                  "solution": f"Adding gives $\\boxed{{{_sig(name) + 2}}}$."}],
    },
)

# Hendrycks ethics (per-subtask schemas)
_register_family(["ethics_deontology"], lambda name: {
    "train": [{"scenario": "I promised to water the plants.",
               "excuse": "So I watered them as agreed.", "label": 1,
               "group_id": 0}],
    "test": [{"scenario": "I agreed to review the paper.",
              "excuse": "So I deleted it unread.", "label": 0, "group_id": 0},
             {"scenario": "I said I would return the ladder.",
              "excuse": "So I brought it back today.", "label": 1,
              "group_id": 0},
             {"scenario": "I promised to call at noon.",
              "excuse": "So I called at noon sharp.", "label": 1,
              "group_id": 0},
             {"scenario": "I was asked to lock the door.",
              "excuse": "So I left it wide open.", "label": 0, "group_id": 0},
             {"scenario": "I offered to carry the bags.",
              "excuse": "So I carried them upstairs.", "label": 1,
              "group_id": 0}],
})
_register_family(["ethics_justice"], lambda name: {
    "train": [{"scenario": "I deserve a refund because the item arrived broken.",
               "label": 1, "group_id": 0}],
    "test": [{"scenario": "I deserve a prize because my neighbor won one.",
              "label": 0, "group_id": 0},
             {"scenario": "I deserve the raise because I exceeded every target.",
              "label": 1, "group_id": 0},
             {"scenario": "I deserve a seat because I bought a ticket.",
              "label": 1, "group_id": 0},
             {"scenario": "I deserve the crown because I woke up early.",
              "label": 0, "group_id": 0},
             {"scenario": "I deserve a refund because the product never shipped.",
              "label": 1, "group_id": 0}],
})
_register_family(["ethics_virtue"], lambda name: {
    "train": [{"scenario": "She shared her lunch with the new student.",
               "trait": "generous", "label": 1, "group_id": 0}],
    "test": [{"scenario": "He mocked the beginner's first attempt.",
              "trait": "kind", "label": 0, "group_id": 0},
             {"scenario": "They kept practicing until midnight.",
              "trait": "diligent", "label": 1, "group_id": 0},
             {"scenario": "She admitted the mistake at once.",
              "trait": "honest", "label": 1, "group_id": 0},
             {"scenario": "He saved a seat for his friend.",
              "trait": "cruel", "label": 0, "group_id": 0},
             {"scenario": "They donated the surplus to the shelter.",
              "trait": "generous", "label": 1, "group_id": 0}],
})
# raw schema: activity (the preferable scenario) + baseline; _process_doc
# shuffles their order with a rng seeded from the activity string
_register_family(["ethics_utilitarianism"], lambda name: {
    "train": [{"activity": "I fixed the leak before it flooded.",
               "baseline": "I ignored the leak until it flooded."}],
    "test": [{"activity": "The picnic was sunny and relaxed.",
              "baseline": "The picnic was rained out."},
             {"activity": "I caught the early bus.",
              "baseline": "I missed the bus and was late."}],
})

# CrowS-Pairs bias-type slices: docs must match the task's bias_type filter
_CROWS_BIAS = {
    "age": "age", "autre": "autre", "disability": "disability",
    "gender": "gender", "nationality": "nationality",
    "physical_appearance": "physical-appearance", "race_color": "race-color",
    "religion": "religion", "sexual_orientation": "sexual-orientation",
    "socioeconomic": "socioeconomic",
}


def _crows_docs(name):
    suffix = name.replace("crows_pairs_english", "").replace(
        "crows_pairs_french", "").lstrip("_")
    bias = _CROWS_BIAS.get(suffix, "age") if suffix else "age"
    return {
        "test": [
            {"sent_more": f"Fixture sentence A for {name}.",
             "sent_less": f"Fixture sentence B for {name}.",
             "bias_type": bias},
            {"sent_more": f"Fixture sentence C for {name}.",
             "sent_less": f"Fixture sentence D for {name}.",
             "bias_type": bias},
        ],
    }


_register_family(_family("crows_pairs_"), _crows_docs)

# QA4MRE years (raw schema: document_str / question_str / nested
# answer_options / 1-based correct_answer_id)
_register_family(_family("qa4mre_"), lambda name: {
    "train": [
        {"document_str": f"Reading passage {_sig(name)} about a study.",
         "question_str": f"What is passage {_sig(name)} about?",
         "answer_options": {"answer_str": ["a study", "a recipe", "a song",
                                           "a map", "a game"]},
         "correct_answer_id": "1"},
        {"document_str": f"Second passage {_sig(name)} about results.",
         "question_str": f"What does passage {_sig(name)} report?",
         "answer_options": {"answer_str": ["results", "weather", "sports",
                                           "prices", "news"]},
         "correct_answer_id": "1"},
    ],
})

# ANLI rounds 2-3
for _r in (2, 3):
    _register_family([f"anli_r{_r}"], lambda name, r=_r: {
        f"train_r{r}": [{"premise": f"Round {r} train premise.",
                         "hypothesis": "Something happened.", "label": 0}],
        f"dev_r{r}": [{"premise": f"Round {r} dev premise.",
                       "hypothesis": "Nothing happened.", "label": 2}],
        f"test_r{r}": [{"premise": f"Round {r} test premise.",
                        "hypothesis": "It happened.", "label": 0}],
    })

# Translation pairs (sacrebleu-style src/ref docs)
_register_family(
    [n for n in task_lib.TASK_REGISTRY
     if n.startswith(("wmt14", "wmt16", "wmt20", "iwslt17"))],
    lambda name: {
        "test": [
            {"src": f"Source sentence one for {name}.",
             "ref": f"Reference sentence one for {name}."},
            {"src": f"Source sentence two for {name}.",
             "ref": f"Reference sentence two for {name}."},
        ],
    },
)

# CBT (cloze with XXXXX placeholder + 10-way options)
_register_family(_family("cbt-"), lambda name: {
    "train": [
        {"sentences": [f"The fixture story {_sig(name)} began quietly."],
         "question": "Then the XXXXX appeared at the door.",
         "options": ["cat", "dog", "girl", "boy", "bird",
                     "horse", "king", "ship", "tree", "car"],
         "answer": "cat"},
        {"sentences": [f"The fixture story {_sig(name)} continued loudly."],
         "question": "Soon the XXXXX joined the parade.",
         "options": ["king", "dog", "girl", "boy", "bird",
                     "horse", "cat", "ship", "tree", "car"],
         "answer": "king"},
    ],
    "validation": [
        {"sentences": [f"A second story {_sig(name)} unfolded."],
         "question": "They sailed the XXXXX across the bay.",
         "options": ["ship", "dog", "girl", "boy", "bird",
                     "horse", "king", "cat", "tree", "car"],
         "answer": "ship"},
    ],
    "test": [
        {"sentences": [f"A third story {_sig(name)} ended well."],
         "question": "The XXXXX galloped over the hill.",
         "options": ["horse", "dog", "girl", "boy", "bird",
                     "ship", "king", "cat", "tree", "car"],
         "answer": "horse"},
    ],
})

# nq_open / babi / headqa (Spanish) / mutual_plus / sat
_register_family(["nq_open"], lambda name: {
    "train": [{"question": "what is the largest ocean", "answer": ["Pacific Ocean"]}],
    "validation": [
        {"question": "who painted the mona lisa", "answer": ["Leonardo da Vinci"]},
        {"question": "how many continents are there", "answer": ["seven", "7"]},
    ],
})
_register_family(["babi"], lambda name: {
    "train": [{"passage": "Mary went to the kitchen. ", "question": "Where is Mary? ",
               "answer": "kitchen"}],
    "valid": [{"passage": "John took the ball. ", "question": "Who has the ball? ",
               "answer": "John"}],
    "test": [{"passage": "Sandra went to the garden. ", "question": "Where is Sandra? ",
              "answer": "garden"},
             {"passage": "Daniel picked up the apple. ", "question": "Who has the apple? ",
              "answer": "Daniel"}],
})
_register_family(["headqa", "headqa_es"], lambda name: {
    "train": [{"qid": "e0", "qtext": "Cual organo bombea la sangre?",
               "answers": [{"atext": "el higado"}, {"atext": "el corazon"},
                           {"atext": "el pulmon"}, {"atext": "el rinon"}],
               "ra": "2"}],
    "test": [{"qid": "e1", "qtext": "Que vitamina produce la piel con el sol?",
              "answers": [{"atext": "vitamina A"}, {"atext": "vitamina B"},
                          {"atext": "vitamina C"}, {"atext": "vitamina D"}],
              "ra": "4"}],
})
_register_family(["mutual_plus"], lambda name: FIXTURE_DOCS["mutual"])
# raw SAT-analogies schema: stem/choices hold space-separated word pairs,
# solution is a lowercase letter
_register_family(["sat"], lambda name: {
    "validation": [
        {"source": "fixture", "stem": "ship sea n:n",
         "choices": ["car road n:n", "bird nest n:n", "book page n:n",
                     "fish bicycle n:n", "sun moon n:n"],
         "solution": "a"},
        {"source": "fixture", "stem": "pen paper n:n",
         "choices": ["brush canvas n:n", "fork song n:n", "lamp cloud n:n",
                     "shoe cloud n:n", "key sky n:n"],
         "solution": "a"},
    ],
})

FIXTURE_DOCS.update({
    "coqa": {
        "train": [
            {"story": "Tom had a red kite. He flew it in the park.",
             "questions": {"input_text": ["What did Tom have?", "Where did he fly it?"]},
             "answers": {"input_text": ["a red kite", "in the park"]},
             "additional_answers": {}},
        ],
        "validation": [
            {"story": "Mia baked bread on Sunday. She shared it with her neighbor.",
             "questions": {"input_text": ["What did Mia bake?", "Who did she share it with?"]},
             "answers": {"input_text": ["bread", "her neighbor"]},
             "additional_answers": {}},
            {"story": "Omar fixed the old bicycle. He rode it to the market.",
             "questions": {"input_text": ["What did Omar fix?", "Where did he ride?"]},
             "answers": {"input_text": ["the old bicycle", "to the market"]},
             "additional_answers": {}},
        ],
    },
    "ethics_utilitarianism_original": {
        "train": [
            {"activity": "I watered the garden before the heatwave.",
             "baseline": "I let the garden dry out.", "rating": "9"},
        ],
        "test": [
            {"activity": "I helped my friend move apartments.",
             "baseline": "I cancelled on my friend last minute.", "rating": "8"},
            {"activity": "I recycled the bottles after the picnic.",
             "baseline": "I littered after the picnic.", "rating": "7"},
        ],
    },
    "math_asdiv": {
        "validation": [
            {"body": "Anna has 3 pencils. She buys 4 more.",
             "question": " How many pencils does she have?",
             "answer": "7 (pencils)"},
            {"body": "A box holds 6 eggs. There are 2 boxes.",
             "question": " How many eggs are there?",
             "answer": "12 (eggs)"},
        ],
    },
    "naturalqs": {
        "train": [
            {"question": {"text": "when was the telephone invented"},
             "annotations": {
                 "long_answer": [{"start_token": 0, "end_token": 6}],
                 "short_answers": [{"text": ["1876"]}],
                 "yes_no_answer": ["NONE"],
             },
             "document": {"tokens": {
                 "token": ["The", "telephone", "was", "invented", "in", "1876", "."],
                 "is_html": [False] * 7,
             }}},
        ],
        "validation": [
            {"question": {"text": "how many legs does a spider have"},
             "annotations": {
                 "long_answer": [{"start_token": 0, "end_token": 5}],
                 "short_answers": [{"text": ["eight"]}],
                 "yes_no_answer": ["NONE"],
             },
             "document": {"tokens": {
                 "token": ["Spiders", "have", "eight", "legs", "."],
                 "is_html": [False] * 5,
             }}},
        ],
    },
    # raw HF qasper schema: one row per paper with nested qas; tasks flatten
    # to one obs per (question, answer annotation)
    "qasper": {
        "train": [
            {"title": "A Study of Parsing", "abstract": "We study parsers.",
             "qas": {
                 "question": ["Which corpus do they parse?"],
                 "answers": [{"answer": [
                     {"unanswerable": False, "yes_no": None,
                      "free_form_answer": "the news corpus",
                      "extractive_spans": []},
                 ]}],
             }},
        ],
        "validation": [
            {"title": "Neural Methods", "abstract": "We present a model.",
             "qas": {
                 "question": ["What dataset is used?",
                              "Is the approach supervised?"],
                 "answers": [
                     {"answer": [
                         {"unanswerable": False, "yes_no": None,
                          "free_form_answer": "the treebank",
                          "extractive_spans": []},
                     ]},
                     {"answer": [
                         {"unanswerable": False, "yes_no": False,
                          "free_form_answer": "",
                          "extractive_spans": []},
                     ]},
                 ],
             }},
        ],
    },
    "quac": {
        "train": [
            {"title": "Ada Lovelace", "section_title": "Early life",
             "paragraph": "Ada Lovelace was born in London in 1815.",
             "question": "Where was she born?", "answer": "London"},
        ],
        "validation": [
            {"title": "Grace Hopper", "section_title": "Career",
             "paragraph": "Grace Hopper developed the first compiler.",
             "question": "What did she develop?", "answer": "the first compiler"},
        ],
    },
    "wsc273": {
        "test": [
            {"text": "The city councilmen refused the demonstrators a permit because they feared violence.",
             "pronoun": "they", "pronoun_loc": 63,
             "options": ["The city councilmen", "the demonstrators"],
             "label": 0, "quote": "they feared violence", "quote_loc": 63},
            {"text": "The trophy doesn't fit into the brown suitcase because it is too small.",
             "pronoun": "it", "pronoun_loc": 55,
             "options": ["the trophy", "the suitcase"],
             "label": 1, "quote": "it is too small", "quote_loc": 55},
        ],
    },
})

# SCROLLS: raw docs are {"id", "pid", "input": "question\n\ntext", "outputs"}
def _scrolls_doc(name, i, question, text, outputs):
    return {"id": f"{name}-{i}", "pid": f"{name}-{i}-0",
            "input": f"{question}\n\n{text}", "outputs": outputs}


FIXTURE_DOCS.update({
    "scrolls_contractnli": {
        "train": [_scrolls_doc("cnli", 0, "The receiving party may share the data.",
                               "Confidential data must not be shared with third parties.",
                               ["Contradiction"])],
        "validation": [
            _scrolls_doc("cnli", 1, "The agreement lasts two years.",
                         "This agreement remains in force for two years.",
                         ["Entailment"]),
            _scrolls_doc("cnli", 2, "The parties may disclose the terms publicly.",
                         "All terms are strictly confidential.", ["Contradiction"]),
        ],
    },
    "scrolls_govreport": {
        "train": [_scrolls_doc("gov", 0, "Summarize the report.",
                               "The agency reviewed its spending and found savings.",
                               ["The agency found savings in its spending review."])],
        "validation": [
            _scrolls_doc("gov", 1, "Summarize the report.",
                         "The committee examined infrastructure needs across regions.",
                         ["The committee reviewed regional infrastructure needs."]),
        ],
    },
    "scrolls_qmsum": {
        "train": [_scrolls_doc("qms", 0, "What did the team decide about the launch?",
                               "Meeting transcript: the team agreed to delay the launch.",
                               ["They decided to delay the launch."])],
        "validation": [
            _scrolls_doc("qms", 1, "What was said about the budget?",
                         "Meeting transcript: the budget will stay flat this year.",
                         ["The budget will remain flat."]),
        ],
    },
    "scrolls_summscreenfd": {
        "train": [_scrolls_doc("ssfd", 0, "Summarize the episode.",
                               "Scene: the detectives finally identify the pattern.",
                               ["The detectives identify the pattern."])],
        "validation": [
            _scrolls_doc("ssfd", 1, "Summarize the episode.",
                         "Scene: an old friend returns with a warning.",
                         ["An old friend returns to deliver a warning."]),
        ],
    },
    "scrolls_narrativeqa": {
        "train": [_scrolls_doc("nqa", 0, "Who found the map?",
                               "In the story, the gardener found the old map.",
                               ["the gardener"])],
        "validation": [
            _scrolls_doc("nqa", 1, "Where was the letter hidden?",
                         "The letter had been hidden beneath the floorboards.",
                         ["beneath the floorboards"]),
        ],
    },
    "scrolls_qasper": {
        "train": [_scrolls_doc("sqas", 0, "Is the method supervised?",
                               "We train with labeled data in all experiments.",
                               ["Yes"])],
        "validation": [
            _scrolls_doc("sqas", 1, "What language is studied?",
                         "All experiments use English corpora.", ["English"]),
        ],
    },
    "scrolls_quality": {
        "train": [_scrolls_doc(
            "qual", 0, "What did the crew repair?",
            "(A) the engine (B) the sail (C) the radio (D) the hull\n\n"
            "The crew spent the night repairing the engine before sailing on.",
            ["the engine"])],
        "validation": [
            _scrolls_doc(
                "qual", 1, "What was served at the feast?",
                "(A) bread (B) fish (C) stew (D) fruit\n\n"
                "At the feast the cooks served a rich stew to everyone.",
                ["stew"]),
        ],
    },
})

# Completed-evaluation variants (PARITY.md "quac / naturalqs decision")
# reuse the parity-stub tasks' raw-schema fixtures verbatim.
FIXTURE_DOCS["quac_gen"] = FIXTURE_DOCS["quac"]
FIXTURE_DOCS["naturalqs_gen"] = FIXTURE_DOCS["naturalqs"]

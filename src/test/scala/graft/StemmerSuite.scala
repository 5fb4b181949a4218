package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PorterStemmer.stem

/** Locks the Porter implementation to the examples published in the
  * algorithm's paper (Porter 1980, "An algorithm for suffix stripping").
  * Where the paper documents a single step's outcome, the word is chosen
  * so that the remaining steps are no-ops on it, making the full-stem
  * output equal the documented per-step output.
  */
class StemmerSuite extends AnyFunSuite {

  test("step 1a plurals (paper examples)") {
    assert(stem("caresses") == "caress")
    assert(stem("ponies") == "poni")
    assert(stem("ties") == "ti")
    assert(stem("caress") == "caress")
    assert(stem("cats") == "cat")
  }

  test("step 1b -ed/-ing with cleanup (paper examples)") {
    assert(stem("feed") == "feed")
    assert(stem("plastered") == "plaster")
    assert(stem("bled") == "bled")
    assert(stem("motoring") == "motor")
    assert(stem("sing") == "sing")
    assert(stem("conflated") == "conflat") // AT→ATE then step5a drops e (m>1)
    assert(stem("sized") == "size") // cvc+e restore, kept at step5a (m=1, *o)
    assert(stem("hopping") == "hop") // double-consonant undoubling
    assert(stem("tanned") == "tan")
    assert(stem("falling") == "fall") // double l NOT undoubled in 1b
    assert(stem("hissing") == "hiss")
    assert(stem("failing") == "fail")
    assert(stem("filing") == "file")
  }

  test("step 1c y→i (paper examples)") {
    assert(stem("happy") == "happi")
    assert(stem("sky") == "sky") // stem 'sk' has no vowel
  }

  test("steps 2-4 suffix chains (paper examples, chained)") {
    assert(stem("relational") == "relat") // 2: →relate; 5a: →relat
    assert(stem("conditional") == "condit") // 2: →condition; 4: ion after t
    assert(stem("rational") == "ration") // 2: tional→tion; 4: m too small
    assert(stem("digitizer") == "digit") // 2: →digitize; 4: ize→
    assert(stem("radicalli") == "radic") // 2: →radical; 4: al→
    assert(stem("feudalism") == "feudal") // 2: alism→al; 4: m("feud")=1 stops
    assert(stem("hopefulness") == "hope") // 2: →hopeful; 3: ful→
    assert(stem("goodness") == "good") // 3: ness→
    assert(stem("formalize") == "formal") // 3: alize→al
    assert(stem("electriciti") == "electr") // 3: →electric; 4: ic→
    assert(stem("triplicate") == "triplic") // 3: icate→ic
    assert(stem("adjustment") == "adjust") // 4
    assert(stem("replacement") == "replac") // 4
    assert(stem("adoption") == "adopt") // 4: ion after t
    assert(stem("airliner") == "airlin") // 4: er→
  }

  test("step 5 final e and double l (paper examples)") {
    assert(stem("probate") == "probat")
    assert(stem("rate") == "rate") // m=1 and *o → e kept
    assert(stem("cease") == "ceas")
    assert(stem("controller") == "control") // 4: er→; 5b: ll→l
    assert(stem("roll") == "roll") // m too small for 5b
  }

  test("short words pass through") {
    assert(stem("a") == "a")
    assert(stem("is") == "is")
    assert(stem("The") == "the") // lowercased
  }
}

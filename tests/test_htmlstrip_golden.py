"""Golden html-strip cases ported from the reference's
HTMLStripCharFilterTest.java (line numbers cited per case). Asserts the
full output string, including block-tag newlines and entity decoding."""

import pytest

from lucene_solr_ray.analysis.htmlstrip import html_to_text

GOLDEN = [
    # test():55 — block tags newline, inline <a> silent, entities, comment
    ('<div class="foo">this is some text</div> here is a '
     '<a href="#bar">link</a> and another '
     '<a href="http://lucene.apache.org/">link</a>. '
     'This is an entity: &amp; plus a &lt;.  Here is an &. '
     '<!-- is a comment -->',
     '\nthis is some text\n here is a link and another link. '
     'This is an entity: & plus a <.  Here is an &. ',
     None),
    # testComment:343
    ('<!--- three dashes, still a valid comment ---> ', ' ', None),
    ('<! -- blah > ', ' ', None),
    ('<!--' + 'x' * 50, '', None),  # unterminated comment drops the rest
    # testServerSideIncludes:423 — comments inside quoted attribute values
    ('one<img src="image.png"\n alt =  "Alt: <!--#echo '
     "var='${IMAGE_CAPTION:<!--comment-->\\'Comment\\'}'  -->\"\n\n"
     ' title="Title: <!--#echo var="IMAGE_CAPTION"-->">two',
     'onetwo', None),
    ('one<script><!-- <!--#config comment="<!-- \\"comment\\"-->"--> -->'
     '</script>two', 'one\ntwo', None),
    # testScriptQuotes:435 — quoted strings inside script comments hide -->
    ('one<script attr= bare><!-- action(\'<!-- comment -->\', '
     '"\\"-->\\""); --></script>two', 'one\ntwo', None),
    ('hello<script><!-- f(\'<!--internal--></script>\'); --></script>',
     'hello\n', None),
    # testEscapeScript:445 — escaped tag kept, content still dropped
    ('one<script no-value-attr>callSomeMethod();</script>two',
     'one<script no-value-attr></script>two', {'script'}),
    # testStyle:452
    ("one<style type=\"text/css\">\n<!--\n@import "
     "url('http://www.lasletrasdecanciones.com/css.css');\n-->\n"
     "</style>two", 'one\ntwo', None),
    ('one<style type="text/css"> body,font,a { font-family:arial; } '
     '</style>two', 'one<style type="text/css"></style>two', {'style'}),
    # testBR:469 / testEscapeBR:481 / testCloseBR:417
    ('one<BR />two<br>three', 'one\ntwo\nthree', None),
    ('one<BR some stuff here too>two</BR>', 'one\ntwo\n', None),
    ("one<BR class='whatever'>two</\nBR\n>",
     "one<BR class='whatever'>two</\nBR\n>", {'BR'}),
    (' Secretary)</br> [[M', ' Secretary)\n [[M', None),
    # testInlineTagsNoSpace:488
    ('one<sPAn class="invisible">two<sup>2<sup>e</sup></sup>.</SpaN>three',
     'onetwo2e.three', None),
    # testCDATA:494 — content verbatim, first ]]> terminates
    ('one<![CDATA[<one><two>three<four></four></two></one>]]>two',
     'one<one><two>three<four></four></two></one>two', None),
    ('one<![CDATA[two<![CDATA[three]]]]><![CDATA[>four]]>five',
     'onetwo<![CDATA[three]]>fourfive', None),
    ('<! [CDATA[&]]>', '', None),
    ('<! [CDATA[&] ] >', '', None),
    ('<! [CDATA[&]]', '<! [CDATA[&]]', None),
    ('<![CDATA[', '', None),
    ('<![CDATA[<br>', '<br>', None),
    ('<![CDATA[<br>]]', '<br>]]', None),
    ('<![CDATA[<br>]]>', '<br>', None),
    ('<![CDATA[<br>] ] >', '<br>] ] >', None),
    # testUnclosedAngleBang:532
    ('<![endif]', '<![endif]', None),
    # testUppercaseCharacterEntityVariants:536
    (' &QUOT;-&COPY;&GT;>&LT;<&REG;&AMP;', ' "-©>><<®&', None),
    # testMSWordMalformedProcessingInstruction:542
    ('one<?xml:namespace prefix = o ns = '
     '"urn:schemas-microsoft-com:office:office" />two', 'onetwo', None),
    # testSupplementaryCharsInTags:548
    ('one<\U00029B05艱鍟䇹愯瀛>two'
     '<瀛愯\U00029B05>three 瀛愯\U00029B05'
     '</瀛愯\U00029B05>four</\U00029B05艱鍟䇹愯'
     '瀛>five<\U00020000\U00020000>six<\U00020000\U00020000/>seven',
     'one\ntwo\nthree 瀛愯\U00029B05\nfour\nfive\nsix\nseven',
     None),
    # testGamma:97 / testEntities:101 / testMoreEntities:107 — the named
    # entity nbsp decodes to a plain space (HTMLCharacterEntities.jflex:124)
    ('&Gamma;', 'Γ', None),
    ('&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;',
     '  <foo> Übermensch = Γ bar Γ', None),
    ('&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;',
     '  <junk/>   ! @ and ’', None),
]


@pytest.mark.parametrize("html,gold,escaped", GOLDEN)
def test_htmlstrip_golden(html, gold, escaped):
    assert html_to_text(html, escaped) == gold


def test_bytes_input():
    assert html_to_text('<p>a &amp; b</p>'.encode()) == '\na & b\n'

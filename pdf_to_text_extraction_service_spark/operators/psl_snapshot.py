"""Public Suffix List snapshot (ICANN section subset).

The PSL (publicsuffix.org — public data, Mozilla-maintained) drives
eTLD+1 ("registered domain") reduction.  This module inlines a
static snapshot of the ICANN-section rules a web crawl actually
hits: the second-level registration suffixes of every major ccTLD
(``co.uk``, ``co.nz``, ``com.sg``, ``com.br``, …), the US state
hierarchy (``<st>.us`` plus ``k12/cc/lib.<st>.us``), Canadian
provinces, and the wildcard TLDs (``*.ck`` …) with their published
exceptions (``!www.ck``).

Scope notes (documented divergences from a full live PSL):

- The PRIVATE section (``github.io``, ``blogspot.com``, S3 buckets,
  …) is intentionally excluded — curation rollups usually want the
  operator-level domain (``github.io`` pages roll up to github.io's
  operator), and the private section churns weekly.
- Deep geographic rules (Japanese municipal wildcards
  ``*.kawasaki.jp``, Norwegian municipalities, ``*.nom.br``) are not
  enumerated; those hosts fall back to the deepest matching rule
  here (e.g. plain ``.jp`` second-level list) — a bounded, explicit
  approximation.
- Unknown TLD + multi-label host falls back to the last two labels,
  the same fallback every PSL consumer uses for unlisted TLDs.

The lists are plain tuples so the JVM side can compile them into an
``InSet`` membership test inside whole-stage codegen — no broadcast
join, no Python in the hot path.
"""

from __future__ import annotations

# --- 2-label public suffixes ("co.uk") -> registered = last 3 labels
_CORE_TWO_LABEL = """
co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk nhs.uk
police.uk
com.au net.au org.au edu.au gov.au asn.au id.au
co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz kiwi.nz
maori.nz iwi.nz health.nz mil.nz parliament.nz cri.nz
ac.za co.za edu.za gov.za law.za mil.za net.za nom.za org.za
school.za web.za
co.jp ne.jp or.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
com.br net.br org.br gov.br edu.br mil.br adv.br arq.br art.br
bio.br blog.br eco.br emp.br eng.br esp.br etc.br eti.br far.br
flog.br fnd.br fot.br fst.br g12.br ggf.br imb.br ind.br inf.br
jor.br jus.br lel.br mat.br med.br mus.br nom.br not.br ntr.br
odo.br ppg.br pro.br psc.br psi.br qsl.br rec.br slg.br srv.br
taxi.br teo.br tmp.br trd.br tur.br tv.br vet.br vlog.br wiki.br
zlg.br
com.cn net.cn org.cn gov.cn edu.cn ac.cn mil.cn ah.cn bj.cn cq.cn
fj.cn gd.cn gs.cn gz.cn gx.cn ha.cn hb.cn he.cn hi.cn hl.cn hn.cn
jl.cn js.cn jx.cn ln.cn nm.cn nx.cn qh.cn sc.cn sd.cn sh.cn sn.cn
sx.cn tj.cn xj.cn xz.cn yn.cn zj.cn hk.cn mo.cn tw.cn
co.in net.in org.in firm.in gen.in ind.in ac.in edu.in res.in
gov.in mil.in nic.in
co.kr ne.kr or.kr re.kr pe.kr go.kr mil.kr ac.kr hs.kr ms.kr es.kr
sc.kr kg.kr seoul.kr busan.kr daegu.kr incheon.kr gwangju.kr
daejeon.kr ulsan.kr gyeonggi.kr gangwon.kr chungbuk.kr chungnam.kr
jeonbuk.kr jeonnam.kr gyeongbuk.kr gyeongnam.kr jeju.kr
com.mx net.mx org.mx edu.mx gob.mx
com.tr net.tr org.tr biz.tr info.tr av.tr bbs.tr bel.tr gen.tr
web.tr edu.tr gov.tr k12.tr pol.tr mil.tr tv.tr dr.tr name.tr
kep.tr
com.ar net.ar org.ar gob.ar edu.ar int.ar mil.ar tur.ar musica.ar
com.sg net.sg org.sg gov.sg edu.sg per.sg
com.hk net.hk org.hk gov.hk edu.hk idv.hk
com.tw net.tw org.tw edu.tw gov.tw mil.tw idv.tw game.tw ebiz.tw
club.tw
com.my net.my org.my gov.my edu.my mil.my name.my
co.th net.th or.th ac.th go.th in.th mi.th
co.id net.id or.id web.id ac.id sch.id go.id mil.id my.id biz.id
desa.id ponpes.id
com.ph net.ph org.ph gov.ph edu.ph ngo.ph mil.ph i.ph
com.vn net.vn org.vn edu.vn gov.vn int.vn ac.vn biz.vn info.vn
name.vn pro.vn health.vn
co.il net.il org.il ac.il gov.il idf.il k12.il muni.il
ac.ru edu.ru gov.ru int.ru mil.ru test.ru com.ru net.ru org.ru
pp.ru msk.ru spb.ru
com.ua net.ua org.ua edu.ua gov.ua in.ua kiev.ua kyiv.ua lviv.ua
od.ua odessa.ua dp.ua kh.ua kharkov.ua dn.ua cherkassy.ua
chernigov.ua crimea.ua
com.pl net.pl org.pl edu.pl gov.pl info.pl biz.pl waw.pl warszawa.pl
krakow.pl wroclaw.pl poznan.pl gda.pl gdansk.pl lodz.pl katowice.pl
lublin.pl szczecin.pl
com.eg net.eg org.eg edu.eg gov.eg sci.eg eun.eg mil.eg name.eg
com.sa net.sa org.sa edu.sa gov.sa med.sa pub.sa sch.sa
co.ae net.ae org.ae gov.ae ac.ae sch.ae mil.ae
com.ng net.ng org.ng edu.ng gov.ng i.ng mil.ng mobi.ng name.ng
sch.ng
co.ke or.ke ne.ke go.ke ac.ke sc.ke me.ke mobi.ke info.ke
com.co net.co org.co edu.co gov.co nom.co mil.co
com.ve net.ve org.ve co.ve e12.ve edu.ve gob.ve info.ve mil.ve
web.ve
com.pe net.pe org.pe edu.pe gob.pe mil.pe nom.pe
gob.cl
com.ec net.ec org.ec edu.ec gob.ec info.ec fin.ec k12.ec med.ec
mil.ec pro.ec
com.uy net.uy org.uy edu.uy gub.uy mil.uy
com.py net.py org.py edu.py gov.py mil.py coop.py una.py
com.bo net.bo org.bo edu.bo gob.bo int.bo mil.bo tv.bo web.bo
com.do net.do org.do edu.do gob.do gov.do mil.do sld.do art.do
web.do
com.gt net.gt org.gt edu.gt gob.gt ind.gt mil.gt
co.cr ac.cr ed.cr fi.cr go.cr or.cr sa.cr
com.pa net.pa org.pa edu.pa gob.pa ac.pa sld.pa abo.pa ing.pa
med.pa nom.pa
com.ni net.ni org.ni edu.ni gob.ni co.ni ac.ni biz.ni info.ni
in.ni int.ni mil.ni nom.ni web.ni
com.hn net.hn org.hn edu.hn gob.hn mil.hn
com.sv edu.sv gob.sv org.sv red.sv
com.cu edu.cu org.cu net.cu gov.cu inf.cu
com.pr net.pr org.pr gov.pr edu.pr isla.pr pro.pr biz.pr info.pr
name.pr est.pr prof.pr ac.pr
com.gr edu.gr net.gr org.gr gov.gr
com.pt edu.pt gov.pt int.pt net.pt nome.pt org.pt publ.pt
com.es nom.es org.es gob.es edu.es
gov.it edu.it
arts.ro com.ro firm.ro info.ro nom.ro nt.ro org.ro rec.ro store.ro
tm.ro www.ro
co.hu info.hu org.hu priv.hu sport.hu tm.hu 2000.hu agrar.hu
bolt.hu city.hu film.hu forum.hu games.hu hotel.hu ingatlan.hu
jogasz.hu konyvelo.hu lakas.hu media.hu news.hu reklam.hu sex.hu
shop.hu suli.hu szex.hu tozsde.hu utazas.hu video.hu
ac.at co.at gv.at or.at
asso.fr com.fr gouv.fr nom.fr prd.fr tm.fr avocat.fr aeroport.fr
avoues.fr cci.fr chambagri.fr chirurgiens-dentistes.fr
experts-comptables.fr geometre-expert.fr greta.fr
huissier-justice.fr medecin.fr notaires.fr pharmacien.fr port.fr
veterinaire.fr
ac.be
com.se org.se pp.se tm.se parti.se press.se
priv.no mil.no dep.no kommune.no herad.no idrett.no fhs.no vgs.no
folkebibl.no fylkesbibl.no museum.no
aland.fi
net.is com.is edu.is gov.is org.is int.is
gov.ie
gov.lt
com.lv edu.lv gov.lv org.lv mil.lv id.lv net.lv asn.lv conf.lv
com.ee org.ee edu.ee gov.ee riik.ee lib.ee med.ee pri.ee aip.ee
fie.ee
com.hr iz.hr from.hr name.hr
co.rs org.rs edu.rs ac.rs gov.rs in.rs
com.mk org.mk net.mk edu.mk gov.mk inf.mk name.mk
com.ba edu.ba gov.ba mil.ba net.ba org.ba
co.me net.me org.me edu.me ac.me gov.me its.me priv.me
com.al edu.al gov.al mil.al net.al org.al
com.by gov.by mil.by of.by
org.kz edu.kz net.kz gov.kz mil.kz com.kz
com.ge edu.ge gov.ge org.ge mil.ge net.ge pvt.ge
co.am com.am commune.am net.am north.am org.am
com.az net.az int.az gov.az org.az edu.az info.az pp.az mil.az
name.az pro.az biz.az
com.pk net.pk edu.pk org.pk fam.pk biz.pk web.pk gov.pk gob.pk
gok.pk gon.pk gop.pk gos.pk info.pk
com.bd edu.bd ac.bd net.bd gov.bd org.bd mil.bd
gov.lk sch.lk net.lk int.lk com.lk org.lk edu.lk ngo.lk soc.lk
web.lk ltd.lk assn.lk grp.lk hotel.lk
com.np edu.np gov.np mil.np net.np org.np
ac.ir co.ir gov.ir id.ir net.ir org.ir sch.ir
gov.iq edu.iq mil.iq com.iq org.iq net.iq
com.jo org.jo net.jo edu.jo sch.jo gov.jo mil.jo name.jo
com.lb edu.lb gov.lb net.lb org.lb
com.kw edu.kw emb.kw gov.kw ind.kw net.kw org.kw
com.qa edu.qa gov.qa mil.qa name.qa net.qa org.qa sch.qa
com.om co.om edu.om ac.om sch.om gov.om net.om org.om mil.om
museum.om biz.om pro.om med.om
com.bh edu.bh net.bh org.bh gov.bh
com.ye edu.ye gov.ye net.ye mil.ye org.ye
edu.sy gov.sy net.sy mil.sy com.sy org.sy
ac.ma co.ma gov.ma net.ma org.ma press.ma
com.dz org.dz net.dz gov.dz edu.dz asso.dz pol.dz art.dz
com.tn ens.tn fin.tn gov.tn ind.tn intl.tn nat.tn net.tn org.tn
info.tn perso.tn tourism.tn
com.ly net.ly gov.ly plc.ly edu.ly sch.ly med.ly org.ly id.ly
com.gh edu.gh gov.gh org.gh mil.gh
ac.tz co.tz go.tz hotel.tz info.tz me.tz mil.tz mobi.tz ne.tz
or.tz sc.tz tv.tz
co.ug or.ug ac.ug sc.ug go.ug ne.ug com.ug org.ug
ac.zm biz.zm co.zm com.zm edu.zm gov.zm info.zm mil.zm net.zm
org.zm sch.zm
ac.zw co.zw gov.zw mil.zw org.zw
com.et gov.et org.et edu.et biz.et name.et info.et net.et
ab.ca bc.ca mb.ca nb.ca nf.ca nl.ca ns.ca nt.ca nu.ca on.ca pe.ca
qc.ca sk.ca yk.ca gc.ca
"""

_US_STATES = (
    "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma "
    "md me mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa pr "
    "ri sc sd tn tx ut va vi vt wa wi wv wy"
).split()

PSL_TWO_LABEL: tuple[str, ...] = tuple(sorted(
    set(_CORE_TWO_LABEL.split())
    | {f"{st}.us" for st in _US_STATES}
))

# --- 3-label public suffixes ("k12.ca.us") -> registered = last 4
PSL_THREE_LABEL: tuple[str, ...] = tuple(sorted(
    {f"{kind}.{st}.us" for st in _US_STATES
     for kind in ("k12", "cc", "lib")}
))

# --- wildcard TLDs ("*.ck"): ANY second-level label is a public
# suffix, so registered = last 3 labels ...
PSL_WILDCARD_TLDS: tuple[str, ...] = (
    "ck", "er", "fj", "fk", "gu", "jm", "kh", "mm", "mz", "pg",
)
# ... except the published exception rules, which are themselves
# registrable at 2 labels
PSL_EXCEPTIONS: tuple[str, ...] = ("www.ck",)

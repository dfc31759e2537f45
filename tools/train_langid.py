"""Offline trainer for the hashed char-n-gram language-ID model.

Usage: python tools/train_langid.py
Regenerates benthos_spark/llm/langid_model.py (weights as a compressed
literal) from the embedded corpus below.

The corpus is assembled from public knowledge only: UDHR Article-1
translations (public domain), common-word/stopword lists, weekday and
number names, and generic composed sentences.  The model is a
multinomial logistic regression over hashed character n-grams (2-4
grams, crc32 % D buckets) — the standard fastText-shaped recipe,
trained here with plain numpy full-batch gradient descent.  Scripts
with unambiguous Unicode ranges (CJK, Hangul, Arabic, Hebrew, Greek,
Devanagari, Thai) are short-circuited at inference and need no
training data.
"""

from __future__ import annotations

import base64
import random
import zlib

import numpy as np

D = 2048          # hash buckets
NGRAMS = (1, 2, 3, 4)
EPOCHS = 6000
LR = 2.0
L2 = 1e-5
SEED = 42

# -------------------------------------------------------------- corpus
# sentences: UDHR Article 1 (public domain) + generic composed text
SENTENCES = {
    "en": [
        "All human beings are born free and equal in dignity and rights.",
        "They are endowed with reason and conscience and should act towards one another in a spirit of brotherhood.",
        "The quick brown fox jumps over the lazy dog.",
        "What time is it and where are we going tomorrow morning?",
        "I would like to thank everyone who helped with this project.",
        "The weather today is cold with a chance of rain in the evening.",
        "She opened the window and looked out over the quiet street.",
        "Please read the following instructions carefully before you begin.",
        "There are many books on the shelf in the corner of the room.",
        "We should meet again next week to discuss the results of the experiment.",
        "His house is near the river, just behind the old church.",
        "Children love to play outside when the sun is shining.",
        'My sister studies biology at a famous university in the north.',
        'The government announced new measures to support small businesses.',
        'We had dinner at a small restaurant near the harbour last night.',
        'The train to London leaves from platform four in ten minutes.',
        'He bought fresh bread and cheese at the market this morning.',
        'Our team won the match after a difficult second half.',
        'The doctor told me to rest and drink plenty of water.',
        'She wrote a long letter to her grandmother about the trip.',
        'Prices have risen sharply over the last few months.',
        'I forgot my umbrella at home and it started to rain.',
    ],
    "de": [
        "Alle Menschen sind frei und gleich an Würde und Rechten geboren.",
        "Sie sind mit Vernunft und Gewissen begabt und sollen einander im Geist der Brüderlichkeit begegnen.",
        "Der schnelle braune Fuchs springt über den faulen Hund.",
        "Wie spät ist es und wohin gehen wir morgen früh?",
        "Ich möchte allen danken, die bei diesem Projekt geholfen haben.",
        "Das Wetter ist heute kalt und am Abend kann es regnen.",
        "Sie öffnete das Fenster und schaute auf die ruhige Straße hinaus.",
        "Bitte lesen Sie die folgenden Anweisungen sorgfältig, bevor Sie beginnen.",
        "Im Regal in der Ecke des Zimmers stehen viele Bücher.",
        "Wir sollten uns nächste Woche wieder treffen, um die Ergebnisse zu besprechen.",
        "Sein Haus liegt am Fluss, gleich hinter der alten Kirche.",
        "Kinder spielen gern draußen, wenn die Sonne scheint.",
        'Meine Schwester studiert Biologie an einer berühmten Universität.',
        'Die Regierung kündigte neue Maßnahmen für kleine Unternehmen an.',
        'Wir haben gestern Abend in einem kleinen Restaurant am Hafen gegessen.',
        'Der Zug nach München fährt in zehn Minuten von Gleis vier ab.',
        'Er kaufte heute Morgen frisches Brot und Käse auf dem Markt.',
        'Unsere Mannschaft gewann das Spiel nach einer schwierigen zweiten Halbzeit.',
        'Der Arzt sagte mir, ich solle mich ausruhen und viel Wasser trinken.',
        'Sie schrieb ihrer Großmutter einen langen Brief über die Reise.',
        'Die Preise sind in den letzten Monaten stark gestiegen.',
        'Ich habe meinen Regenschirm zu Hause vergessen und es begann zu regnen.',
    ],
    "fr": [
        "Tous les êtres humains naissent libres et égaux en dignité et en droits.",
        "Ils sont doués de raison et de conscience et doivent agir les uns envers les autres dans un esprit de fraternité.",
        "Le rapide renard brun saute par-dessus le chien paresseux.",
        "Quelle heure est-il et où allons-nous demain matin ?",
        "Je voudrais remercier tous ceux qui ont aidé à ce projet.",
        "Le temps est froid aujourd'hui avec un risque de pluie dans la soirée.",
        "Elle a ouvert la fenêtre et a regardé la rue tranquille.",
        "Veuillez lire attentivement les instructions suivantes avant de commencer.",
        "Il y a beaucoup de livres sur l'étagère dans le coin de la pièce.",
        "Nous devrions nous revoir la semaine prochaine pour discuter des résultats.",
        "Sa maison est près de la rivière, juste derrière la vieille église.",
        "Les enfants aiment jouer dehors quand le soleil brille.",
        'Ma sœur étudie la biologie dans une université célèbre du nord.',
        'Le gouvernement a annoncé de nouvelles mesures pour les petites entreprises.',
        'Nous avons dîné hier soir dans un petit restaurant près du port.',
        'Le train pour Paris part du quai quatre dans dix minutes.',
        'Il a acheté du pain frais et du fromage au marché ce matin.',
        'Notre équipe a gagné le match après une deuxième mi-temps difficile.',
        "Le médecin m'a dit de me reposer et de boire beaucoup d'eau.",
        'Elle a écrit une longue lettre à sa grand-mère au sujet du voyage.',
        'Les prix ont fortement augmenté ces derniers mois.',
        "J'ai oublié mon parapluie à la maison et il a commencé à pleuvoir.",
    ],
    "es": [
        "Todos los seres humanos nacen libres e iguales en dignidad y derechos.",
        "Dotados como están de razón y conciencia, deben comportarse fraternalmente los unos con los otros.",
        "El rápido zorro marrón salta sobre el perro perezoso.",
        "¿Qué hora es y adónde vamos mañana por la mañana?",
        "Me gustaría agradecer a todos los que ayudaron con este proyecto.",
        "El tiempo hoy es frío con posibilidad de lluvia por la tarde.",
        "Ella abrió la ventana y miró hacia la calle tranquila.",
        "Por favor, lea atentamente las siguientes instrucciones antes de empezar.",
        "Hay muchos libros en la estantería en el rincón de la habitación.",
        "Deberíamos reunirnos otra vez la próxima semana para hablar de los resultados.",
        "Su casa está cerca del río, justo detrás de la vieja iglesia.",
        "A los niños les encanta jugar afuera cuando brilla el sol.",
        'Mi hermana estudia biología en una universidad famosa del norte.',
        'El gobierno anunció nuevas medidas para las pequeñas empresas.',
        'Anoche cenamos en un pequeño restaurante cerca del puerto.',
        'El tren a Sevilla sale del andén cuatro en diez minutos.',
        'Compró pan fresco y queso en el mercado esta mañana.',
        'Nuestro equipo ganó el partido después de una segunda parte difícil.',
        'El médico me dijo que descansara y bebiera mucha agua.',
        'Escribió una carta larga a su abuela sobre el viaje.',
        'Los precios han subido mucho en los últimos meses.',
        'Olvidé el paraguas en casa y empezó a llover.',
    ],
    "it": [
        "Tutti gli esseri umani nascono liberi ed eguali in dignità e diritti.",
        "Essi sono dotati di ragione e di coscienza e devono agire gli uni verso gli altri in spirito di fratellanza.",
        "La rapida volpe marrone salta sopra il cane pigro.",
        "Che ore sono e dove andiamo domani mattina?",
        "Vorrei ringraziare tutti coloro che hanno aiutato con questo progetto.",
        "Il tempo oggi è freddo con possibilità di pioggia in serata.",
        "Lei ha aperto la finestra e ha guardato la strada tranquilla.",
        "Si prega di leggere attentamente le seguenti istruzioni prima di iniziare.",
        "Ci sono molti libri sullo scaffale nell'angolo della stanza.",
        "Dovremmo incontrarci di nuovo la prossima settimana per discutere i risultati.",
        "La sua casa è vicino al fiume, proprio dietro la vecchia chiesa.",
        "Ai bambini piace giocare fuori quando splende il sole.",
        'Mia sorella studia biologia in una famosa università del nord.',
        'Il governo ha annunciato nuove misure per le piccole imprese.',
        'Ieri sera abbiamo cenato in un piccolo ristorante vicino al porto.',
        'Il treno per Milano parte dal binario quattro tra dieci minuti.',
        'Ha comprato pane fresco e formaggio al mercato questa mattina.',
        'La nostra squadra ha vinto la partita dopo un secondo tempo difficile.',
        'Il medico mi ha detto di riposare e di bere molta acqua.',
        'Ha scritto una lunga lettera alla nonna sul viaggio.',
        'I prezzi sono aumentati molto negli ultimi mesi.',
        "Ho dimenticato l'ombrello a casa ed è cominciato a piovere.",
    ],
    "pt": [
        "Todos os seres humanos nascem livres e iguais em dignidade e em direitos.",
        "Dotados de razão e de consciência, devem agir uns para com os outros em espírito de fraternidade.",
        "A rápida raposa marrom salta sobre o cão preguiçoso.",
        "Que horas são e para onde vamos amanhã de manhã?",
        "Gostaria de agradecer a todos os que ajudaram neste projeto.",
        "O tempo hoje está frio com possibilidade de chuva à noite.",
        "Ela abriu a janela e olhou para a rua tranquila.",
        "Por favor, leia atentamente as seguintes instruções antes de começar.",
        "Há muitos livros na estante no canto do quarto.",
        "Devemos nos encontrar novamente na próxima semana para discutir os resultados.",
        "A casa dele fica perto do rio, logo atrás da velha igreja.",
        "As crianças adoram brincar lá fora quando o sol está brilhando.",
        'Minha irmã estuda biologia numa universidade famosa do norte.',
        'O governo anunciou novas medidas para as pequenas empresas.',
        'Ontem à noite jantamos num pequeno restaurante perto do porto.',
        'O trem para o Rio sai da plataforma quatro em dez minutos.',
        'Ele comprou pão fresco e queijo no mercado hoje de manhã.',
        'Nossa equipe venceu o jogo depois de um segundo tempo difícil.',
        'O médico me disse para descansar e beber bastante água.',
        'Ela escreveu uma longa carta à avó sobre a viagem.',
        'Os preços subiram muito nos últimos meses.',
        'Esqueci o guarda-chuva em casa e começou a chover.',
    ],
    "nl": [
        "Alle mensen worden vrij en gelijk in waardigheid en rechten geboren.",
        "Zij zijn begiftigd met verstand en geweten en behoren zich jegens elkander in een geest van broederschap te gedragen.",
        "De snelle bruine vos springt over de luie hond.",
        "Hoe laat is het en waar gaan we morgenochtend naartoe?",
        "Ik wil iedereen bedanken die bij dit project heeft geholpen.",
        "Het weer is vandaag koud met kans op regen in de avond.",
        "Zij opende het raam en keek uit over de rustige straat.",
        "Lees de volgende instructies zorgvuldig voordat u begint.",
        "Er staan veel boeken op de plank in de hoek van de kamer.",
        "We zouden elkaar volgende week weer moeten ontmoeten om de resultaten te bespreken.",
        "Zijn huis ligt bij de rivier, net achter de oude kerk.",
        "Kinderen spelen graag buiten als de zon schijnt.",
        'Mijn zus studeert biologie aan een beroemde universiteit in het noorden.',
        'De regering kondigde nieuwe maatregelen aan voor kleine bedrijven.',
        'Gisteravond aten we in een klein restaurant bij de haven.',
        'De trein naar Rotterdam vertrekt over tien minuten van spoor vier.',
        'Hij kocht vanochtend vers brood en kaas op de markt.',
        'Ons team won de wedstrijd na een moeilijke tweede helft.',
        'De dokter zei dat ik moest rusten en veel water moest drinken.',
        'Ze schreef een lange brief aan haar oma over de reis.',
        'De prijzen zijn de afgelopen maanden sterk gestegen.',
        'Ik vergat mijn paraplu thuis en het begon te regenen.',
    ],
    "sv": [
        "Alla människor är födda fria och lika i värde och rättigheter.",
        "De har utrustats med förnuft och samvete och bör handla gentemot varandra i en anda av gemenskap.",
        "Den snabba bruna räven hoppar över den lata hunden.",
        "Vad är klockan och vart ska vi imorgon bitti?",
        "Jag skulle vilja tacka alla som hjälpte till med det här projektet.",
        "Vädret är kallt idag med risk för regn på kvällen.",
        "Hon öppnade fönstret och tittade ut över den lugna gatan.",
        "Läs följande instruktioner noggrant innan du börjar.",
        "Det finns många böcker på hyllan i hörnet av rummet.",
        "Vi borde träffas igen nästa vecka för att diskutera resultaten.",
        "Hans hus ligger nära floden, strax bakom den gamla kyrkan.",
        "Barn älskar att leka utomhus när solen skiner.",
        'Min syster studerar biologi vid ett berömt universitet i norr.',
        'Regeringen tillkännagav nya åtgärder för små företag.',
        'Igår kväll åt vi på en liten restaurang nära hamnen.',
        'Tåget till Göteborg avgår från spår fyra om tio minuter.',
        'Han köpte färskt bröd och ost på marknaden i morse.',
        'Vårt lag vann matchen efter en svår andra halvlek.',
        'Läkaren sa åt mig att vila och dricka mycket vatten.',
        'Hon skrev ett långt brev till sin mormor om resan.',
        'Priserna har stigit kraftigt de senaste månaderna.',
        'Jag glömde paraplyet hemma och det började regna.',
    ],
    "pl": [
        "Wszyscy ludzie rodzą się wolni i równi pod względem swej godności i swych praw.",
        "Są oni obdarzeni rozumem i sumieniem i powinni postępować wobec innych w duchu braterstwa.",
        "Szybki brązowy lis przeskakuje nad leniwym psem.",
        "Która jest godzina i dokąd idziemy jutro rano?",
        "Chciałbym podziękować wszystkim, którzy pomogli przy tym projekcie.",
        "Pogoda jest dziś zimna, wieczorem może padać deszcz.",
        "Otworzyła okno i spojrzała na spokojną ulicę.",
        "Proszę uważnie przeczytać poniższe instrukcje przed rozpoczęciem.",
        "Na półce w rogu pokoju stoi wiele książek.",
        "Powinniśmy spotkać się znowu w przyszłym tygodniu, aby omówić wyniki.",
        "Jego dom stoi nad rzeką, tuż za starym kościołem.",
        "Dzieci uwielbiają bawić się na dworze, kiedy świeci słońce.",
        'Moja siostra studiuje biologię na znanym uniwersytecie na północy.',
        'Rząd ogłosił nowe przepisy dla małych firm.',
        'Wczoraj wieczorem zjedliśmy kolację w małej restauracji przy porcie.',
        'Pociąg do Gdańska odjeżdża z peronu czwartego za dziesięć minut.',
        'Kupił świeży chleb i ser na targu dziś rano.',
        'Nasza drużyna wygrała mecz po trudnej drugiej połowie.',
        'Lekarz powiedział mi, żebym odpoczywał i pił dużo wody.',
        'Napisała długi list do babci o podróży.',
        'Ceny mocno wzrosły w ostatnich miesiącach.',
        'Zapomniałem parasola w domu i zaczęło padać.',
    ],
    "tr": [
        "Bütün insanlar hür, haysiyet ve haklar bakımından eşit doğarlar.",
        "Akıl ve vicdana sahiptirler ve birbirlerine karşı kardeşlik zihniyeti ile hareket etmelidirler.",
        "Hızlı kahverengi tilki tembel köpeğin üzerinden atlar.",
        "Saat kaç ve yarın sabah nereye gidiyoruz?",
        "Bu projeye yardım eden herkese teşekkür etmek istiyorum.",
        "Bugün hava soğuk ve akşam yağmur yağabilir.",
        "Pencereyi açtı ve sakin sokağa baktı.",
        "Başlamadan önce lütfen aşağıdaki talimatları dikkatlice okuyun.",
        "Odanın köşesindeki rafta birçok kitap var.",
        "Sonuçları konuşmak için gelecek hafta tekrar buluşmalıyız.",
        "Onun evi nehrin yakınında, eski kilisenin hemen arkasında.",
        "Çocuklar güneş parlarken dışarıda oynamayı severler.",
        "Yeni bir işe başlamadan önce her şeyi dikkatlice düşünmek gerekir.",
        "Bu kitabı geçen yıl bir arkadaşımdan ödünç aldım.",
        "Türkiye'nin en büyük şehri İstanbul'dur ve orada milyonlarca insan yaşar.",
        "Yarın sabah erken kalkıp sahile yürüyüşe gideceğiz.",
        "Ekonomi ile ilgili haberleri her gün gazeteden okuyorum.",
        "Öğrenciler sınava hazırlanmak için kütüphanede ders çalışıyorlar.",
        'Kız kardeşim kuzeydeki ünlü bir üniversitede biyoloji okuyor.',
        'Hükümet küçük işletmeler için yeni önlemler açıkladı.',
        'Dün akşam limanın yanındaki küçük bir lokantada yemek yedik.',
        'İzmir treni dört numaralı perondan on dakika sonra kalkıyor.',
        'Bu sabah pazardan taze ekmek ve peynir aldı.',
        'Takımımız zor geçen ikinci yarıdan sonra maçı kazandı.',
        'Doktor bana dinlenmemi ve bol su içmemi söyledi.',
        'Büyükannesine yolculuk hakkında uzun bir mektup yazdı.',
        'Fiyatlar son aylarda çok arttı.',
        'Şemsiyemi evde unuttum ve yağmur yağmaya başladı.',
    ],
    "id": [
        "Semua orang dilahirkan merdeka dan mempunyai martabat dan hak-hak yang sama.",
        "Mereka dikaruniai akal dan hati nurani dan hendaknya bergaul satu sama lain dalam semangat persaudaraan.",
        "Rubah coklat yang cepat melompati anjing yang malas.",
        "Jam berapa sekarang dan ke mana kita pergi besok pagi?",
        "Saya ingin berterima kasih kepada semua orang yang membantu proyek ini.",
        "Cuaca hari ini dingin dengan kemungkinan hujan di malam hari.",
        "Dia membuka jendela dan melihat ke jalan yang tenang.",
        "Silakan baca petunjuk berikut dengan cermat sebelum memulai.",
        "Ada banyak buku di rak di sudut ruangan.",
        "Kita harus bertemu lagi minggu depan untuk membahas hasilnya.",
        "Rumahnya dekat sungai, tepat di belakang gereja tua.",
        "Anak-anak suka bermain di luar saat matahari bersinar.",
        'Adik perempuan saya belajar biologi di universitas terkenal di utara.',
        'Pemerintah mengumumkan kebijakan baru untuk usaha kecil.',
        'Tadi malam kami makan malam di restoran kecil dekat pelabuhan.',
        'Kereta ke Surabaya berangkat dari peron empat sepuluh menit lagi.',
        'Dia membeli roti segar dan keju di pasar pagi ini.',
        'Tim kami memenangkan pertandingan setelah babak kedua yang sulit.',
        'Dokter menyuruh saya beristirahat dan minum banyak air.',
        'Dia menulis surat panjang kepada neneknya tentang perjalanan itu.',
        'Harga-harga naik tajam dalam beberapa bulan terakhir.',
        'Saya lupa payung di rumah dan hujan mulai turun.',
    ],
    "ru": [
        "Все люди рождаются свободными и равными в своем достоинстве и правах.",
        "Они наделены разумом и совестью и должны поступать в отношении друг друга в духе братства.",
        "Быстрая коричневая лиса прыгает через ленивую собаку.",
        "Который час и куда мы идем завтра утром?",
        "Я хотел бы поблагодарить всех, кто помогал с этим проектом.",
        "Погода сегодня холодная, вечером возможен дождь.",
        "Она открыла окно и посмотрела на тихую улицу.",
        "Пожалуйста, внимательно прочитайте следующие инструкции перед началом.",
        "На полке в углу комнаты стоит много книг.",
        "Мы должны встретиться снова на следующей неделе, чтобы обсудить результаты.",
        "Его дом находится у реки, сразу за старой церковью.",
        "Дети любят играть на улице, когда светит солнце.",
        'Моя сестра изучает биологию в известном университете на севере.',
        'Правительство объявило новые меры для малого бизнеса.',
        'Вчера вечером мы ужинали в маленьком ресторане возле порта.',
        'Поезд в Казань отправляется с четвертой платформы через десять минут.',
        'Он купил свежий хлеб и сыр на рынке сегодня утром.',
        'Наша команда выиграла матч после трудного второго тайма.',
        'Врач сказал мне отдыхать и пить много воды.',
        'Она написала бабушке длинное письмо о поездке.',
        'Цены сильно выросли за последние месяцы.',
        'Я забыл зонт дома, и начался дождь.',
    ],
}

WORDS = {
    "en": "the of and to in is was for that with his on as he by at from "
          "they she which will their said has more when who them would "
          "about time people could other than then these some her into "
          "year day week month water house world school between never "
          "always under while because through little".split(),
    "de": "der die und das ist nicht ein eine mit auf für von dem den im "
          "sich des auch als nach wird bei einer aus werden hat dass sind "
          "noch wie einem über einen so zum haben nur oder aber vor zur "
          "bis mehr durch können Jahr Zeit Menschen Haus Wasser Woche "
          "immer unter während weil klein zwischen".split(),
    "fr": "le de la et les des en un du une que est dans qui par pour "
          "pas sur plus ne se au sont avec son ce il aux ou mais comme "
          "ses cette était tout nous leur deux ans entre temps gens "
          "maison eau semaine toujours sous pendant parce petit".split(),
    "es": "de la que el en y los se del las por un para con una su al es "
          "lo como más pero sus le ha o este sí porque esta son entre "
          "está cuando muy sin sobre también fue había años tiempo gente "
          "casa agua semana siempre bajo mientras pequeño".split(),
    "it": "di e il la che in un per è non una sono da con si del le al "
          "dei nel come più anche lo se ma gli alla questo della hanno "
          "essere sulla tra anni tempo gente casa acqua settimana sempre "
          "sotto mentre perché piccolo fra dopo".split(),
    "pt": "de a o que e do da em um para é com não uma os no se na por "
          "mais as dos como mas foi ao ele das tem à seu sua ou ser "
          "quando muito há nos já está eu também anos tempo gente casa "
          "água semana sempre sob enquanto porque pequeno".split(),
    "nl": "de van het een en in is dat op te zijn met die voor aan niet "
          "er om ook als dan maar bij uit naar door over nog worden werd "
          "heeft kunnen jaar tijd mensen huis water week altijd onder "
          "terwijl omdat klein tussen tegen zonder".split(),
    "sv": "och i att det som en på är av för med till den har de inte om "
          "ett han men var sig från vi så kan man när år tid människor "
          "hus vatten vecka alltid under medan eftersom liten mellan "
          "utan efter skulle också bara".split(),
    "pl": "w i na z do się nie że jest to jak po co za od ale czy przez "
          "tak jego jej ich być ma już tylko przy która który może bardzo "
          "lat czas ludzie dom woda tydzień zawsze pod podczas ponieważ "
          "mały między bez żeby także".split(),
    "tr": "bir ve bu da ne için ile olarak çok daha gibi kadar sonra ama "
          "var yok en ki mi de olan her şey ben sen biz onlar yıl zaman "
          "insanlar ev su hafta altında iken çünkü küçük gün bugün yarın "
          "arasında olmadan böyle ancak değil şimdi bütün kendi büyük "
          "yeni eski iyi kötü nasıl neden nerede hangi bazı diğer üzerine "
          "doğru karşı hükümet şehir ülke çocuk kadın adam sabah akşam "
          "dün hava deniz yağmur güneş kitap okul üniversite tren dakika "
          "saat hafta sonu önce sonra açıkladı geldi gitti yaptı oldu "
          "etmek olmak gelmek gitmek almak vermek görmek bilmek istemek "
          "sevmek başlamak".split(),
    "id": "yang dan di itu dengan untuk tidak ini dari dalam akan pada "
          "juga ke karena ada mereka sudah saya kita atau oleh bisa lebih "
          "tahun waktu orang rumah air minggu selalu bawah sementara "
          "kecil antara tanpa seperti telah harus".split(),
    "ru": "и в не на я что он с как это по но они мы все она так его быть "
          "от же вы за то из у них о еще бы год время люди дом вода "
          "неделя всегда под пока потому маленький между без чтобы "
          "тоже когда только уже".split(),
}

LANGS = sorted(SENTENCES) + ["xx"]   # xx = explicit noise class

_LOREM = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua "
          "enim ad minim veniam quis nostrud exercitation ullamco").split()


def make_noise_docs(rng: random.Random, n: int) -> list[str]:
    """The 'unknown' class: random letter runs, digit/symbol soup, and
    lorem-ipsum filler — text that matches no real language."""
    docs = []
    letters = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(n):
        kind = rng.random()
        if kind < 0.4:
            docs.append(" ".join(
                "".join(rng.choice(letters)
                        for _ in range(rng.randint(2, 10)))
                for _ in range(rng.randint(3, 15))))
        elif kind < 0.6:
            docs.append(" ".join(
                str(rng.randint(0, 10 ** rng.randint(1, 8)))
                for _ in range(rng.randint(3, 12))))
        elif kind < 0.8:
            docs.append(" ".join(rng.choice(_LOREM)
                                 for _ in range(rng.randint(4, 18))))
        else:  # repeated single token
            tok = "".join(rng.choice(letters)
                          for _ in range(rng.randint(2, 6)))
            docs.append(" ".join([tok] * rng.randint(3, 10)))
    return docs


def hash_feats(text: str) -> dict[int, float]:
    t = " " + " ".join(text.lower().split()) + " "
    counts: dict[int, float] = {}
    for n in NGRAMS:
        for i in range(len(t) - n + 1):
            h = zlib.crc32(t[i:i + n].encode("utf-8")) % D
            counts[h] = counts.get(h, 0.0) + 1.0
    norm = sum(v * v for v in counts.values()) ** 0.5 or 1.0
    return {k: v / norm for k, v in counts.items()}


def make_docs(rng: random.Random, lang: str, n: int) -> list[str]:
    docs = []
    sents, words = SENTENCES[lang], WORDS[lang]
    for _ in range(n):
        kind = rng.random()
        if kind < 0.4:
            docs.append(rng.choice(sents))
        elif kind < 0.7:
            docs.append(" ".join(rng.choice(words)
                                 for _ in range(rng.randint(4, 20))))
        else:  # sentence fragment + words (noisy mix)
            s = rng.choice(sents).split()
            k = rng.randint(3, max(3, len(s) - 1))
            frag = " ".join(s[:k])
            docs.append(frag + " " + " ".join(
                rng.choice(words) for _ in range(rng.randint(0, 6))))
    return docs


def main() -> None:
    rng = random.Random(SEED)
    X_rows, y = [], []
    for li, lang in enumerate(LANGS):
        docs = (make_noise_docs(rng, 400) if lang == "xx"
                else make_docs(rng, lang, 400))
        for doc in docs:
            X_rows.append(hash_feats(doc))
            y.append(li)
    n, L = len(X_rows), len(LANGS)
    X = np.zeros((n, D), dtype=np.float32)
    for i, row in enumerate(X_rows):
        for k, v in row.items():
            X[i, k] = v
    Y = np.zeros((n, L), dtype=np.float32)
    Y[np.arange(n), y] = 1.0

    W = np.zeros((D, L), dtype=np.float32)
    b = np.zeros(L, dtype=np.float32)
    for epoch in range(EPOCHS):
        Z = X @ W + b
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        G = (P - Y) / n
        W -= LR * (X.T @ G + L2 * W)
        b -= LR * G.sum(axis=0)
        if epoch % 500 == 0:
            acc = (P.argmax(axis=1) == np.array(y)).mean()
            print(f"epoch {epoch}: train acc {acc:.4f}")

    acc = ((X @ W + b).argmax(axis=1) == np.array(y)).mean()
    print(f"final train acc {acc:.4f}")

    blob = base64.b64encode(zlib.compress(
        W.astype(np.float16).tobytes() + b.astype(np.float16).tobytes(),
        9)).decode("ascii")
    lines = [blob[i:i + 76] for i in range(0, len(blob), 76)]
    payload = "\n".join(f'    "{ln}"' for ln in lines)
    out = f'''"""Hashed char-n-gram language-ID model weights (GENERATED).

Produced by tools/train_langid.py from its embedded public-knowledge
corpus (UDHR Article-1 translations + common-word lists).  Multinomial
logistic regression over crc32-hashed {NGRAMS} character grams,
D={D} buckets, float16 weights, zlib+base64 packed.  Regenerate with:
    python tools/train_langid.py
"""

LANGS = {LANGS!r}
D = {D}
NGRAMS = {NGRAMS!r}

_BLOB = (
{payload}
)


def load_weights():
    """-> (W [D x L] float32, b [L] float32)"""
    import base64
    import zlib

    import numpy as np
    raw = zlib.decompress(base64.b64decode(_BLOB))
    L = len(LANGS)
    W = np.frombuffer(raw[:D * L * 2], dtype=np.float16)
    b = np.frombuffer(raw[D * L * 2:], dtype=np.float16)
    return (W.reshape(D, L).astype(np.float32),
            b.astype(np.float32))
'''
    path = "benthos_spark/llm/langid_model.py"
    with open(path, "w") as fh:
        fh.write(out)
    print(f"wrote {path} ({len(blob)} b64 chars)")


if __name__ == "__main__":
    main()
